"""Physical-timestamp-type regression tests (VERDICT r03 #4).

The driver regenerates /root/testdata between rounds, and the physical
parquet encoding of ``events.ts`` has already drifted once — round 1-3 data
was TIMESTAMP(NANOS) (read as long under nanosAsLong), the 19:14 regen
switched to TIMESTAMP(MICROS, isAdjustedToUTC=false), which a vanilla
session infers as TIMESTAMP_NTZ. That silent swap broke ext_sessionize at
every SF (VERDICT r03 "What's wrong" #1).

These tests write tiny events fixtures in BOTH vintages and drive every
ts-consuming operator over each on the vanilla session, so the next silent
regeneration cannot break anything ts-shaped again. ``catalog.load_table``
must normalize both to plain TimestampType (session tz pinned UTC by
``ensure_confs``, so wall-clock values are identical either way).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_etl_automation_spark import catalog
from kafka_etl_automation_spark.operators import joins, sessions

# 2 users; user 1 has a >30min gap after the 3rd event, user 2 one session.
_TS_US = [
    1_700_000_000_000_000,
    1_700_000_060_000_000,
    1_700_000_120_000_000,
    1_700_003_000_000_000,  # +48min gap -> new session for user 1
    1_700_000_030_000_000,
    1_700_000_090_000_000,
]
_USERS = [1, 1, 1, 1, 2, 2]
_EVENT_IDS = [10, 11, 12, 13, 20, 21]
_TYPES = ["click", "click", "purchase", "click", "click", "purchase"]
_VALUES = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def _write_events(dirpath: str, vintage: str) -> str:
    """Write an events.parquet fixture in the requested physical vintage."""
    if vintage == "us_naive":
        ts = pa.array(_TS_US, type=pa.timestamp("us"))  # no tz => NTZ inferred
    elif vintage == "ns":
        ts = pa.array(
            [t * 1000 for t in _TS_US], type=pa.timestamp("ns", tz="UTC")
        )
    else:  # pragma: no cover
        raise ValueError(vintage)
    table = pa.table(
        {
            "event_id": pa.array(_EVENT_IDS, type=pa.int64()),
            "user_id": pa.array(_USERS, type=pa.int64()),
            "event_type": pa.array(_TYPES, type=pa.string()),
            "value": pa.array(_VALUES, type=pa.float64()),
            "ts": ts,
        }
    )
    os.makedirs(dirpath, exist_ok=True)
    out = os.path.join(dirpath, "events.parquet")
    # store_schema=False drops the Arrow schema metadata so Spark types from
    # the parquet logical type alone — exactly how the driver's testdata
    # reads; version 2.6 permits nanos for the ns vintage
    pq.write_table(table, out, store_schema=False, version="2.6")
    return dirpath


VINTAGES = ("us_naive", "ns")


@pytest.fixture(params=VINTAGES)
def events_dir(request, tmp_path):
    return _write_events(str(tmp_path / request.param), request.param)


def test_load_table_normalizes_to_timestamp(spark, events_dir):
    df = catalog.load_table(spark, events_dir, "events")
    assert df.schema["ts"].simpleString().endswith("ts:timestamp"), (
        "catalog must normalize every physical vintage to TimestampType, got "
        + df.schema["ts"].simpleString()
    )
    # values identical across vintages (UTC session tz pinned)
    rows = {r.event_id: r.ts for r in df.collect()}
    assert rows[10].isoformat() == "2023-11-14T22:13:20"


def test_sessionize_over_both_vintages(spark, events_dir):
    df = catalog.load_table(spark, events_dir, "events")
    out = sessions.sessionize(df, gap_minutes=30).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2  # the 48-min gap splits user 1
    assert len(per_user[2]) == 1
    assert sum(r.n_events for r in out) == 6


def test_sessionize_ntz_direct(spark, events_dir):
    """The operator itself (no catalog) must accept whatever the vanilla
    reader infers — including TIMESTAMP_NTZ (VERDICT r03 #1)."""
    catalog.ensure_confs(spark)
    raw = spark.read.parquet(os.path.join(events_dir, "events.parquet"))
    if raw.schema["ts"].dataType.typeName() == "long":
        pytest.skip("ns vintage arrives as long; catalog owns that decode")
    out = sessions.sessionize(raw, gap_minutes=30).collect()
    assert sum(r.n_events for r in out) == 6


def test_asof_tolerance_over_both_vintages(spark, events_dir):
    df = catalog.load_table(spark, events_dir, "events")
    clicks = df.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = df.filter("event_type = 'purchase'").select("user_id", "ts", "value")
    out = joins.asof_join(
        clicks, purch, on="user_id", tolerance_seconds=3600
    ).collect()
    by_event = {r.event_id: r for r in out}
    # user1 click at +3000s is 2880s after the purchase at t+120 -> within 1h
    assert by_event[13].value == 3.0
    # clicks before any purchase stay unmatched
    assert by_event[10].value is None


def test_asof_tolerance_ntz_direct(spark, events_dir):
    catalog.ensure_confs(spark)
    raw = spark.read.parquet(os.path.join(events_dir, "events.parquet"))
    if raw.schema["ts"].dataType.typeName() == "long":
        pytest.skip("ns vintage arrives as long; catalog owns that decode")
    clicks = raw.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = raw.filter("event_type = 'purchase'").select("user_id", "ts", "value")
    out = joins.asof_join(
        clicks, purch, on="user_id", tolerance_seconds=1000
    ).collect()
    by_event = {r.event_id: r for r in out}
    # 2880s age > 1000s tolerance -> timed out
    assert by_event[13].value is None


def test_windowed_counts_over_both_vintages(spark, events_dir):
    df = catalog.load_table(spark, events_dir, "events")
    out = sessions.windowed_counts(df, window_minutes=60).collect()
    assert sum(r.n_events for r in out) == 6
    assert all(r.window_start is not None for r in out)
