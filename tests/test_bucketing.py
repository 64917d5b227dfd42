"""Bucketed co-located joins: same-bucketed tables must join with no
shuffle exchange — the 100 TB fact/dim join strategy."""

from __future__ import annotations

import contextlib
import io as _io

from pyspark.sql import functions as F

from kafka_etl_automation_spark.catalog import write_bucketed


def physical_plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    facts = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
    )
    dims = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("label")
    )
    write_bucketed(facts, "b_facts", ["k"], buckets=8)
    write_bucketed(dims, "b_dims", ["k"], buckets=8)

    bf, bd = spark.table("b_facts"), spark.table("b_dims")
    # force a non-broadcast path so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bf.join(bd, "k")
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # results still correct
        assert joined.count() == 100
        plain = facts.join(dims, "k")
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_aggregation_has_no_exchange(spark):
    facts = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    write_bucketed(facts, "b_agg", ["k"], buckets=8)
    try:
        agg = spark.table("b_agg").groupBy("k").agg(F.sum("v").alias("sv"))
        plan = physical_plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
