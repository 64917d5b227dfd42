"""Skew-mitigation utilities: salted aggregate/join must equal the plain
versions (same results, different physical distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_etl_automation_spark.operators import skew


def skewed_df(spark):
    # one hot key (0) holding 90% of rows
    return spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    salted = skew.salted_aggregate(
        df,
        ["k"],
        {"n": ("uid", "count"), "sv": ("v", "sum"), "mx": ("v", "max")},
        salt_col="uid",
        buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.count("uid").alias("n"), F.sum("v").alias("sv"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_aggregate_rejects_non_mergeable(spark):
    import pytest

    with pytest.raises(ValueError, match="re-aggregatable"):
        skew.salted_aggregate(
            skewed_df(spark), ["k"], {"a": ("v", "avg")}, salt_col="uid"
        )


def test_salted_join_matches_plain(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame(
        [(0, "hot"), (950, "cold")], "k long, label string"
    )
    salted = skew.salted_join(big, small, ["k"], salt_col="uid", buckets=4)
    plain = big.join(small, ["k"])
    assert salted.count() == plain.count() == 901
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_small_side_preserving_modes(spark):
    import pytest

    big = skewed_df(spark)
    small = spark.createDataFrame([(0, "hot")], "k long, label string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            skew.salted_join(big, small, ["k"], salt_col="uid", how=how)


def test_salted_join_left_outer(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame([(0, "hot")], "k long, label string")
    salted = skew.salted_join(big, small, ["k"], salt_col="uid", buckets=4, how="left")
    plain = big.join(small, ["k"], "left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))