"""As-of join and range join unit tests (edge paths beyond the oracle)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kafka_etl_automation_spark.operators import joins


def ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(30)), (3, 2, ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(8), 100.0), (1, ts(25), 200.0), (2, ts(50), 999.0)],
        "user_id long, ts timestamp, price double",
    )
    out = {r.event_id: (r.price, r.matched_ts)
           for r in joins.asof_join(left, right, on="user_id").collect()}
    assert out[1] == (100.0, ts(8))    # latest prior
    assert out[2] == (200.0, ts(25))   # skips older state
    assert out[3] == (None, None)      # right exists only in the future


def test_asof_equal_ts_matches(spark):
    """right.ts == left.ts counts as prior (>= semantics, like DuckDB ASOF)."""
    left = spark.createDataFrame([(1, 1, ts(10))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(1, ts(10), 7.0)],
                                  "user_id long, ts timestamp, v double")
    row = joins.asof_join(left, right, on="user_id").first()
    assert (row.v, row.matched_ts) == (7.0, ts(10))


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 1, ts(30))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(1, ts(10), 5.0)],
                                  "user_id long, ts timestamp, v double")
    ok = joins.asof_join(left, right, on="user_id", tolerance_seconds=3600).first()
    assert ok.v == 5.0
    stale = joins.asof_join(left, right, on="user_id", tolerance_seconds=600).first()
    assert stale.v is None and stale.matched_ts is None  # 20 min > 10 min tol


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame([(0.5,), (2.5,), (9.0,)], "x double")
    intervals = spark.createDataFrame(
        [(0.0, 1.0, "a"), (2.0, 3.0, "b"), (2.4, 2.6, "c")],
        "lo double, hi double, label string",
    )
    inner = joins.range_join(points, intervals, "x", bucket_width=0.5)
    got = {(r.x, r.label) for r in inner.collect()}
    assert got == {(0.5, "a"), (2.5, "b"), (2.5, "c")}
    left = joins.range_join(points, intervals, "x", bucket_width=0.5, how="left")
    rows = left.collect()
    assert len(rows) == 4  # 3 matches + unmatched 9.0 with nulls
    assert any(r.x == 9.0 and r.label is None for r in rows)


def test_asof_null_attribute_not_backfilled(spark):
    """The matched right row's NULL attribute must stay NULL — values and
    matched_ts always come from the SAME right row (code-review r02 #2)."""
    left = spark.createDataFrame([(1, 1, ts(30))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(10), 5.0), (1, ts(20), None)],
        "user_id long, ts timestamp, v double",
    )
    row = joins.asof_join(left, right, on="user_id").first()
    assert row.matched_ts == ts(20) and row.v is None


def test_asof_null_keys_and_null_ts_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, ts(30)), (2, 1, ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, ts(10), 7.0), (1, None, 9.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {r.event_id: (r.v, r.matched_ts)
           for r in joins.asof_join(left, right, on="user_id").collect()}
    # NULL-key left row: unmatched; NULL-key right row: never a match;
    # NULL-ts right row: never prior to anything
    assert out[1] == (None, None)
    assert out[2] == (None, None)


def test_asof_subsecond_tolerance(spark):
    from datetime import datetime

    left = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1, 0, 10, 0, 900000))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0, 100000), 5.0)],
        "user_id long, ts timestamp, v double",
    )
    # true age 600.8s: must be rejected at 600s tolerance (long-cast
    # truncation would have admitted it)
    row = joins.asof_join(left, right, on="user_id", tolerance_seconds=600).first()
    assert row.v is None


def test_range_join_left_null_column_not_duplicated(spark):
    """Matched rows carrying NULLs must not be re-emitted as unmatched
    (null-unsafe anti-join, code-review r02 #3)."""
    points = spark.createDataFrame([(2.5, None), (9.0, "t")], "x double, tag string")
    intervals = spark.createDataFrame([(2.0, 3.0)], "lo double, hi double")
    out = joins.range_join(points, intervals, "x", bucket_width=1.0, how="left")
    rows = out.collect()
    assert len(rows) == 2
    matched = [r for r in rows if r.x == 2.5]
    assert len(matched) == 1 and matched[0].lo == 2.0


def test_range_join_rejects_bad_bucket_width(spark):
    import pytest

    points = spark.createDataFrame([(1.0,)], "x double")
    intervals = spark.createDataFrame([(0.0, 1.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        joins.range_join(points, intervals, "x", bucket_width=0)


def test_range_join_boundary_inclusive(spark):
    points = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    intervals = spark.createDataFrame([(1.0, 2.0)], "lo double, hi double")
    out = joins.range_join(points, intervals, "x", bucket_width=10.0)
    assert out.count() == 2  # both endpoints included
