"""Per-stage cost attribution for the top bench queries (VERDICT r04 #2).

Decomposes the three most expensive bench plans into their physical
stages and times each stage the same way bench.py times whole queries
(noop sink, min-of-two after a warm-up), so the deltas attribute cost to
scan vs projection vs shuffle instead of guessing from totals:

- ext_curation_pipeline: raw documents scan  ->  + score/filter
  projections (curation.score_and_filter — the same plan object curate
  builds)  ->  + fingerprint-keyed dedup shuffle (full curate);
- ext_approx_cardinality: sketch-only path (count + HLL in ONE hash agg,
  map-side combinable — what actually ships at 100 TB)  vs  the full
  gate query whose exact countDistinct verifier forces an Expand +
  per-(type,user) distinct shuffle;
- ext_text_stats: raw documents scan  vs  the full stats projection —
  isolates whether a drift in the bench reading is the parquet scan or
  the split/array expression work (r04's 0.7s->3.5s question);
- ext_minhash_lsh shingle-hash formulation COST pin (VERDICT r08 #1):
  the three value-identical _shingle_hash_rows formulations (r07
  posexplode + window lead; r08 slice x n + arrays_zip; r09 shipped
  explode(sequence) + element_at) each timed through the full 64-min
  signature aggregation. The shipped row must not read slower than
  either superseded formulation beyond run noise — a future swap that
  regresses the constant shows up here, not in a driver delta three
  rounds later. Value equality is pinned separately by
  tests/test_operators.py::test_shingle_hash_rows_formulations.

Usage: python tools/stage_bench.py [SF_DIR ...]
  (default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)

Prints a markdown stage table per SF dir (for PLANS.md) and writes
machine-readable rows to tools/stage_bench_out.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from pyspark.sql import Window  # noqa: E402

from kafka_etl_automation_spark.catalog import load_tables  # noqa: E402
from kafka_etl_automation_spark.operators import (  # noqa: E402
    curation,
    dedup,
    text,
)
from kafka_etl_automation_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(spark, fn) -> float:
    """min-of-two wall seconds, same methodology as bench.py."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _noop(fn())
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def _shingle_formulation_rows(docs) -> list[dict]:
    """COST pin for _shingle_hash_rows (VERDICT r08 #1): time the three
    value-identical formulations through the full minhash signature
    aggregation. The shipped one must be fastest-or-tied; a formulation
    swap that regresses the constant shows up in this table immediately
    instead of as an unexplained driver delta next round. Value equality
    is pinned by test_shingle_hash_rows_formulations."""
    n, num_hashes = 3, 64
    d = docs.select("doc_id", "text")

    def leadwin():
        ex = d.select(
            F.col("doc_id").alias("id"),
            F.posexplode(dedup.tokens("text")).alias("pos", "t0"),
        )
        w = Window.partitionBy("id").orderBy("pos")
        leads = [F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, n)]
        return (
            ex.select("id", "t0", *leads)
            .filter(F.col(f"t{n - 1}").isNotNull())
            .select(
                "id",
                F.xxhash64(*[F.col(f"t{k}") for k in range(n)]).alias("sh"),
            )
        )

    def slicezip():
        toks = dedup.tokens("text")
        base = d.select(
            F.col("doc_id").alias("id"),
            toks.alias("tk"),
            (F.size(toks) - (n - 1)).alias("m"),
        ).filter(F.col("m") >= 1)
        z = F.arrays_zip(
            *[F.slice("tk", i + 1, F.col("m")).alias(f"t{i}") for i in range(n)]
        )
        return base.select("id", F.explode(z).alias("s")).select(
            "id",
            F.xxhash64(*[F.col("s")[f"t{k}"] for k in range(n)]).alias("sh"),
        )

    def shipped():
        return dedup._shingle_hash_rows(d, "text", "doc_id", n)

    def sigs(fn):
        return lambda: fn().groupBy("id").agg(
            *[
                F.min(F.xxhash64(F.lit(j), F.col("sh"))).alias(f"mh{j}")
                for j in range(num_hashes)
            ]
        )

    return [
        {
            "query": "ext_minhash_lsh",
            "stage": "signatures, r07 posexplode + window-lead",
            "fn": sigs(leadwin),
        },
        {
            "query": "ext_minhash_lsh",
            "stage": "signatures, r08 slice + arrays_zip",
            "fn": sigs(slicezip),
        },
        {
            "query": "ext_minhash_lsh",
            "stage": "signatures, SHIPPED explode(sequence)+element_at",
            "fn": sigs(shipped),
        },
    ]


def stages_for(spark, sf_dir: str) -> list[dict]:
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    events = load_tables(spark, sf_dir, names=("events",))["events"]

    def card_sketch_only():
        # the deployable path: ONE hash aggregate, partials merge
        # map-side, sketch is fixed-size per (type) — no distinct shuffle
        return events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "n_users_approx"
            ),
        )

    def card_full():
        return events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "n_users_approx"
            ),
        )

    rows = [
        {
            "query": "ext_curation_pipeline",
            "stage": "scan (documents, all cols)",
            "fn": lambda: docs,
        },
        {
            "query": "ext_curation_pipeline",
            "stage": "scan + score/filter projections",
            "fn": lambda: curation.score_and_filter(docs),
        },
        {
            "query": "ext_curation_pipeline",
            "stage": "full (+ fingerprint dedup shuffle)",
            "fn": lambda: curation.curate(docs),
        },
        {
            "query": "ext_approx_cardinality",
            "stage": "sketch-only (100 TB ship path)",
            "fn": card_sketch_only,
        },
        {
            "query": "ext_approx_cardinality",
            "stage": "full (+ exact countDistinct verifier)",
            "fn": card_full,
        },
        {
            "query": "ext_text_stats",
            "stage": "scan (documents, all cols)",
            "fn": lambda: docs,
        },
        {
            "query": "ext_text_stats",
            "stage": "full (scan + stats projections)",
            "fn": lambda: text.text_stats(docs),
        },
    ]
    rows.extend(_shingle_formulation_rows(docs))
    for r in rows:
        r["sec"] = _time(spark, r.pop("fn"))
    return rows


def main() -> int:
    dirs = sys.argv[1:] or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ]
    spark = get_spark("stage_bench")
    # warm codegen once so stage numbers measure plans, not session startup
    load_tables(spark, dirs[0], names=("documents",))["documents"].count()

    out = []
    for d in dirs:
        rows = stages_for(spark, d)
        out.append({"sf_dir": d, "stages": rows})
        print(f"\n### stage attribution @ {d}\n")
        print("| query | stage | sec |")
        print("|---|---|---:|")
        for r in rows:
            print(f"| {r['query']} | {r['stage']} | {r['sec']:.2f} |")

    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "stage_bench_out.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {dest}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
