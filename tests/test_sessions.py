"""Sessionization + event-time window tests, batch and streaming."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from kafka_etl_automation_spark.operators import sessions


def ts(minute):
    return datetime(2024, 1, 1, minute // 60, minute % 60, tzinfo=timezone.utc)


def events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


ROWS = [
    # user 1: events at 0, 10, 20 min (one session), then 100, 105 (second)
    (1, 1, ts(0), 1.0),
    (2, 1, ts(10), 1.0),
    (3, 1, ts(20), 1.0),
    (4, 1, ts(100), 1.0),
    (5, 1, ts(105), 1.0),
    # user 2: single event
    (6, 2, ts(50), 2.0),
]


def test_batch_sessionize(spark):
    out = sessions.sessionize(events_df(spark, ROWS), gap_minutes=30)
    got = {
        (r.user_id, r.session_seq): (r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }
    naive = lambda m: ts(m).replace(tzinfo=None)  # noqa: E731
    assert got[(1, 0)] == (naive(0), naive(20), 3)
    assert got[(1, 1)] == (naive(100), naive(105), 2)
    assert got[(2, 0)] == (naive(50), naive(50), 1)


def test_batch_windowed_counts(spark):
    out = sessions.windowed_counts(events_df(spark, ROWS), window_minutes=60)
    got = {r.window_start: (r.n_events, r.sum_value) for r in out.collect()}
    naive = lambda m: ts(m).replace(tzinfo=None)  # noqa: E731
    assert got[naive(0)] == (4, 5.0)  # 0,10,20 (u1) + 50 (u2)
    assert got[naive(60)] == (2, 2.0)  # 100, 105


def test_stream_windowed_counts_matches_batch(spark, tmp_root):
    """The watermarked streaming agg over availableNow must converge to the
    batch answer once all data is drained."""
    src = os.path.join(tmp_root, "src")
    events_df(spark, ROWS).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(events_df(spark, ROWS).schema).parquet(src)
    )
    agg = sessions.stream_windowed_counts(stream, 60, watermark_minutes=120)
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.window_start: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    batch = {
        r.window_start: (r.n_events, r.sum_value)
        for r in sessions.windowed_counts(events_df(spark, ROWS), 60).collect()
    }
    assert got == batch


def test_stream_sessionize_stateful(spark, tmp_root):
    """applyInPandasWithState sessionizer: one batch holding two sessions
    for user 1 -> the older session closes within the batch; the open
    session stays in state (append mode emits closed sessions only)."""
    src = os.path.join(tmp_root, "src")
    events_df(spark, ROWS).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events_df(spark, ROWS).schema).parquet(src)
    out = sessions.stream_sessionize(stream, gap_minutes=30)
    # NOTE: availableNow + ProcessingTimeTimeout keeps running state-cleanup
    # batches until pending timeouts fire, so drive the query with
    # processAllAvailable + stop instead of awaitTermination.
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
        .start()
    )
    import time

    try:
        # poll the sink: the engine keeps running state-cleanup batches
        # (pending processing-time timeouts), so both awaitTermination and
        # processAllAvailable would block far longer than the data needs
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM sess").first().c >= 1:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sess").collect()
    got = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in rows}
    naive = lambda m: ts(m).replace(tzinfo=None)  # noqa: E731
    # user 1's first session (0-20, 3 events) closed deterministically when
    # the 100' event arrived in the same batch; the 100-105 session and
    # user 2's singleton stay open in state (append emits closed only; the
    # timeout flush path is exercised by the engine's cleanup batches)
    assert got == {(1, naive(0), naive(20), 3)}
