"""Stream-stream enrichment: watermark-bounded event-time interval joins.

The reference enriches arrival records against reference/conformed tables
inside each micro-batch (/root/reference/Kafka_ArrivalToConform.sh:392-470
joins staged arrivals to conformed state before merging). The Spark-native
generalization when BOTH sides are streams is the stream-stream join with
an event-time range condition: Spark buffers each side in state and the
watermark + time bound tell it exactly when buffered rows can never match
again and may be evicted.

Why the time bound is not optional at scale: a stream-stream equi-join
without an event-time constraint must keep EVERY past row in state forever
(unbounded growth — the streaming analog of a cross join). With
``watermark`` and a [lag, lead] window, state per side is bounded by
(watermark + window) worth of data, independent of stream lifetime — the
only shape that survives a 100 TB/day pair of streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lead: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` keys where the right event lands inside
    ``[left_ts, left_ts + lead]`` — the click-after-impression /
    payment-after-order enrichment shape.

    Both sides get an event-time watermark; with the interval condition
    Spark derives state-eviction watermarks for both join sides, so state
    stays bounded. ``left_ts``/``right_ts`` must be DISTINCT column names
    (rename before calling) because both survive into the output row.

    Outer variants (``how='leftOuter'`` etc.) emit the unmatched row only
    once the watermark proves no match can still arrive — correctness via
    the same eviction math, no extra code.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ (both survive in the output); "
            "rename one side before joining"
        )
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(shared)}; "
            "rename before joining"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in on:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {lead}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicated key columns from the right side
    for k in on:
        joined = joined.drop(rw[k])
    return joined
