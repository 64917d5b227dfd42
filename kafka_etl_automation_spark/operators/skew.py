"""Skew-mitigation utilities for 100 TB joins and aggregations.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
with skewed partitions automatically; these helpers cover the cases AQE
can't re-plan:

- ``salted_aggregate``: two-phase aggregation for heavy-hitter group keys —
  partial aggregate on (key, salt), final aggregate on key. The classic
  map-side-combine extension for when one key owns a double-digit share of
  the rows (a hot user_id / null-ish default key).
- ``salted_join``: replicate the small side over N salt values so the big
  side's hot key spreads across N tasks. Costs N copies of the small side
  (broadcast-shaped), buys an N-way fan-out of the hottest partition.

Both keep everything in Catalyst expressions (rand-free: salt comes from a
deterministic hash of a secondary column, so results are reproducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(col: Column | str, buckets: int) -> Column:
    """Reproducible salt in [0, buckets): hash of a high-cardinality column
    (never rand() — reruns and differential tests must agree)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}: the re-aggregatable functions (count re-combines
    as sum). A hot key's rows split across ``buckets`` partial groups, so no
    single task owns the whole heavy hitter.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not re-aggregatable (use sum/count/min/max)")

    salted = df.withColumn("_salt", deterministic_salt(salt_col, buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side deterministically,
    replicate the small side across every salt value, join on keys + salt.
    The hot key's rows land in ``buckets`` different tasks instead of one.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        # right/full outer would emit `buckets` copies of every unmatched
        # small-side row (it is replicated across all salt values)
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"({sorted(allowed)}); got {how!r}"
        )
    big_s = big.withColumn("_salt", deterministic_salt(salt_col, buckets))
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(buckets)])
    ).alias("_salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")
