"""Physical-plan audit: sweep every registered query for scale antipatterns.

For each ``queries()`` entry, renders ``explain(formatted)`` and flags:
- CartesianProduct      (unkeyed cross join — a 100 TB killer)
- BatchEvalPython       (row-at-a-time Python UDF — only ArrowEvalPython /
                         mapInPandas are sanctioned)
- BroadcastOverGenerate (a BroadcastExchange whose subtree contains a
                         Generate: the build side is explode-derived, and
                         Catalyst does NOT multiply row estimates through
                         Generate — the narrow post-explode projection then
                         collapses sizeInBytes under the broadcast
                         threshold, so a frame that GROWS WITH THE CORPUS
                         gets planned as a broadcast. Caught live at the
                         2700x octave (r09): the containment check's
                         ~600M-row train-gram distinct was broadcast and
                         overflowed driver maxResultSize; unbounded on a
                         real cluster. Structural, so it transfers across
                         SFs — gate-SF sizes would never trip a size check)
- scans with no pushed filters when the query is selective
- missing WholeStageCodegen coverage (informational)

Exit 1 if a hard antipattern appears in a query not on the allowlist.
Usage: python tools/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# Queries where a flagged pattern is the documented, intended design.
ALLOW = {
    # broadcast nested-loop over a tiny broadcast query side is the exact
    # brute-force baseline design (operators/similarity.py:42)
    "ext_cosine_topk": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # single-row agg frames cross-joined into one result row — constant size
    "a9_count_minus": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "q1_count_check": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "q2_data_diff": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    "f5_timestamp_sanity": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # scalar-subquery equality join: Catalyst plans the one-row subquery as
    # a broadcast nested loop — constant-size broadcast side, by design
    "j4_scalar_subquery_join": {"BroadcastNestedLoopJoin"},
    # conservation check crossJoins two single-row agg frames
    "stream_file_ingest": {"BroadcastNestedLoopJoin"},
    # documented exact all-pairs verifier (id_a < id_b inequality join);
    # the deployable path is the bucketed ext_lsh_embedding_near_dup
    "ext_embedding_near_dup": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # CC over the same exact verifier pair graph (gate-SF only; deployable
    # pair source is lsh_embedding_near_dup_pairs — reviewed 2026-08-13)
    "ext_semantic_clusters": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # centroid-assignment join broadcasts the n_cells centroid rows —
    # bounded small side by construction
    "ext_ivf_topk": {"BroadcastNestedLoopJoin"},
    # per-validation one-row count frames crossJoined into result rows
    "fact_validation_suite": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # three single-row stage-count frames cross-combined into 3 result rows
    "ext_funnel": {"BroadcastNestedLoopJoin"},
    # built on cosine_topk: tiny broadcast query side, non-equi
    # (neighbor != query) condition — same design as ext_cosine_topk
    "ext_knn_label_agreement": {"BroadcastNestedLoopJoin"},
    # dense time spine x broadcast distinct-types grid: |hours| x |types|
    # rows by construction, independent of corpus size
    "ext_gapfill": {"BroadcastNestedLoopJoin"},
    # broadcast build side is the k=16 centroid frame (Generate over
    # collect_list'd cell summaries) — BOUNDED BY k, never by the corpus
    "ext_kmeans_convergence": {"BroadcastOverGenerate"},
    # broadcast build side is explode(sequence) over DISTINCT (lo, hi)
    # range endpoints of p_size — bounded by the dimension's value domain
    # (~50 sizes x a few grid cells), never by fact cardinality
    "ext_range_join": {"BroadcastOverGenerate"},
}

HARD = ("CartesianProduct", "BatchEvalPython")


def broadcast_over_generate(tree: str) -> bool:
    """True if any BroadcastExchange's SUBTREE contains a Generate that is
    NOT itself under an InMemoryRelation — the explode-derived-build-side
    structure whose Catalyst size estimate is bogus at corpus scale (see
    module docstring). An InMemoryRelation is a stats boundary: this
    repo's convention is persist + EAGER count() (grep 'eager' in
    operators/), so a cached subtree reports its MEASURED size and a
    broadcast over it is size-sound at any SF; the convention is what
    makes this exemption valid — a persist without the eager count would
    still plan from the child estimate. Parses the plan tree's
    indentation: a node's children carry a strictly longer structural
    prefix ('   :- ', '   +- ', ...) until the prefix returns to the
    node's own length."""
    lines = tree.splitlines()

    def depth(line: str) -> int:
        return len(re.match(r"^[ :+\-*]*", line).group(0))

    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                continue
            if depth(nxt) <= d and "==" not in nxt:
                break
            if "InMemoryTableScan" in nxt or "InMemoryRelation" in nxt:
                # Cache boundary: everything below reports MEASURED stats,
                # and the cached child plan prints through
                # AdaptiveSparkPlan sections whose '== Final Plan =='
                # blocks reset the indentation — depth tracking cannot
                # follow them, so stop scanning this broadcast subtree at
                # the first cache. An estimate derived FROM a measured
                # cache (filter/distinct over it) is bounded by the
                # measured size, so it is size-sound too.
                break
            if "Generate" in nxt:
                return True
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark("plan-audit")
    failures = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        tree = df._jdf.queryExecution().executedPlan().toString()
        flags = [p for p in HARD if p in plan]
        if broadcast_over_generate(tree):
            flags.append("BroadcastOverGenerate")
        bnl = "BroadcastNestedLoopJoin" in plan
        wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        bad = [f for f in flags if f not in ALLOW.get(name, set())]
        if bnl and "BroadcastNestedLoopJoin" not in ALLOW.get(name, set()):
            bad.append("BroadcastNestedLoopJoin")
        status = "FLAG" if bad else "ok"
        print(
            f"  {name:28s} {status:4s} bhj={bhj} smj={smj} codegen={wsc} "
            f"arrow={arrow}{' ' + ','.join(bad) if bad else ''}"
        )
        if bad:
            failures.append((name, bad))
    if failures:
        print("\nFLAGGED:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
