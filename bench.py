"""Headline benchmark: wall-clock per query at $SPARK_GRAFT_SF_DIR (sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Query set: the flagship dim build, the heaviest relational operators, the
scale-path dedup/similarity/text extensions, SCD merge, multimodal
mapInPandas, and the streaming ingest contract — the data-plane surface.
Control-plane registry round-trips (m2/ctl) are excluded: they measure tiny
metadata writes, not engine throughput.

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "flagship_dim_customer",
    "a3_pricing_summary",
    "a6_dup_finder",
    "a9_count_minus",
    "w1_latest_per_group",
    "e1_minus_symdiff",
    "j2_constant_on_pred",
    "f8_clean_strings",
    "t6_incremental_window",
    "m4_scd2_merge",
    "q2_data_diff",
    "pipeline_incremental_load",
    "pipeline_arrival_to_dim",
    "ext_exact_dedup",
    "ext_minhash_lsh",
    "ext_simhash_pairs",
    "ext_text_stats",
    "ext_quality_score",
    "ext_cosine_topk",
    "ext_lsh_cosine_topk",
    # NOT ext_embedding_near_dup: the exact all-pairs verifier is O(N^2) by
    # design (correctness gate only); the deployable scale path is below.
    "ext_lsh_embedding_near_dup",
    "ext_ivf_topk",
    "ext_token_counts",
    "ext_top_terms",
    "ext_sessionize",
    "ext_windowed_counts",
    "ext_asof_join",
    "ext_range_join",
    "ext_window_analytics",
    "ext_rollup",
    "ext_quantiles",
    # NOT ext_dedup_clusters: built on the quadratic exact-pair verifier
    "ext_salted_agg",
    "ext_hash_split",
    "mm_image_features",
    "mm_frame_sample",
    "stream_file_ingest",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    import __spark_entry__ as entry_mod
    from kafka_etl_automation_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # Warm the JVM/codegen paths AND the Arrow Python-worker pool once so
    # per-query numbers measure the queries, not session/worker startup
    # (first mapInPandas pays ~6s of worker spinup).
    qs["a1_minmax_nvl"](spark, sf_dir).collect()
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # one bad query must not zero the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)
        # operators that persist() multi-branch intermediates (minhash LSH)
        # would otherwise accumulate cached blocks across the whole run
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
