"""Attribution for stream_file_ingest's wall (VERDICT r12 #7): is the
~2.5-4s bench number N micro-batches x a fixed scheduling constant, or
data? Splits the query into its phases with wall + job counts:

  setup    — range-partitioned source write + the empty file
  drain    — the availableNow micro-batch run (per-batch seconds from the
             audit table itself, which records batch_seconds)
  checks   — read_audit + contiguity + summary construction
  write    — the final noop write of the one-row summary

Usage: python tools/stream_ingest_attrib.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from kafka_etl_automation_spark.catalog import load_table
    from kafka_etl_automation_spark.session import get_spark
    from kafka_etl_automation_spark.streaming import ingest

    spark = get_spark("stream_ingest_attrib")
    # same warmup as bench.py so phase walls aren't JVM/worker spinup
    load_table(spark, sf_dir, "events").limit(10).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    report = {}
    for run in range(3):
        events = load_table(spark, sf_dir, "events")
        root = os.path.join("/tmp", f"ingest_attrib_{uuid.uuid4().hex}")
        src = os.path.join(root, "src")

        def jobs() -> int:
            return max(st.getJobIdsForGroup() or [0])

        j0, t0 = jobs(), time.time()
        events.repartitionByRange(4, "event_id").write.parquet(src)
        events.limit(0).coalesce(1).write.mode("append").parquet(src)
        j1, t1 = jobs(), time.time()
        result = ingest.run_file_ingest(
            spark,
            source_dir=src,
            schema=events.schema,
            bronze_base=os.path.join(root, "bronze"),
            audit_path=os.path.join(root, "audit"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            topic="events",
            run_id=1,
            max_files_per_trigger=1,
        )
        j2, t2 = jobs(), time.time()
        audit = ingest.read_audit(spark, os.path.join(root, "audit"))
        assert ingest.contiguity_violations(
            audit, order_col="from_offset"
        ).isEmpty()
        summary = ingest.streaming_contract_summary(
            spark, audit, result.bronze_dirs
        )
        j3, t3 = jobs(), time.time()
        summary.write.format("noop").mode("overwrite").save()
        j4, t4 = jobs(), time.time()
        batch_secs = [
            round(r["batch_seconds"], 3)
            for r in audit.select("batch_seconds").collect()
        ]
        report[f"run{run}"] = {
            "setup_sec": round(t1 - t0, 3),
            "setup_jobs": j1 - j0,
            "drain_sec": round(t2 - t1, 3),
            "drain_jobs": j2 - j1,
            "n_batches": result.n_batches,
            "batch_seconds": sorted(batch_secs, reverse=True),
            "checks_sec": round(t3 - t2, 3),
            "checks_jobs": j3 - j2,
            "final_write_sec": round(t4 - t3, 3),
            "total_sec": round(t4 - t0, 3),
        }
        print(f"# run{run}: {report[f'run{run}']}", file=sys.stderr)
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
