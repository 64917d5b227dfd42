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
  the split/array expression work (r04's 0.7s->3.5s question).

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

from kafka_etl_automation_spark.catalog import load_tables  # noqa: E402
from kafka_etl_automation_spark.operators import (  # noqa: E402
    curation,
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
