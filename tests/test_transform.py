"""End-to-end incremental loader tests (the conform->staging lifecycle)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_etl_automation_spark import scd
from kafka_etl_automation_spark.control import JobRegistry
from kafka_etl_automation_spark.transform import incremental_load


def _src_runs(reg, n):
    for _ in range(n):
        r = reg.start_run("conform")
        reg.finish_run("conform", r, status=1)


def test_two_loads_consume_disjoint_windows(spark, tmp_root):
    reg = JobRegistry(spark, os.path.join(tmp_root, "ctl"))
    source = spark.range(100).select(
        F.col("id"), (F.col("id") % 4 + 1).alias("job_run_id")
    )
    staging = os.path.join(tmp_root, "staging")
    audit = os.path.join(tmp_root, "audit")

    _src_runs(reg, 2)
    r1 = incremental_load(
        spark, reg, "stg", "conform", source, "job_run_id", staging, audit
    )
    assert r1 is not None and r1.dq_passed
    assert (r1.window.min_run_id, r1.window.max_run_id) == (1, 2)
    assert r1.records == 50  # ids with run 1 or 2

    _src_runs(reg, 1)
    r2 = incremental_load(
        spark, reg, "stg", "conform", source, "job_run_id", staging, audit
    )
    assert (r2.window.min_run_id, r2.window.max_run_id) == (3, 3)
    assert r2.records == 25

    # short-circuit when nothing new
    assert (
        incremental_load(spark, reg, "stg", "conform", source, "job_run_id", staging)
        is None
    )

    # staged data: no overlap between load partitions, totals conserved
    dim = scd.read_dim(spark, staging)
    assert dim.count() == 75
    assert dim.select("id").distinct().count() == 75
    # DQ audit rows landed with run ids
    log = spark.read.parquet(audit)
    assert log.filter("status = 'PASS'").count() == log.count() and log.count() == 4
