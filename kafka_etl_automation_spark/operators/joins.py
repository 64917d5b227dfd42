"""Custom join operators Spark lacks natively: as-of join, range join.

Both are compositions of existing DataFrame ops (SURVEY §7.3 / project
brief: prefer composition over Pandas fallbacks when semantics allow), so
Catalyst owns the physical plan and both scale as ordinary keyed
shuffles — no cross products, no Python.

- ``asof_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key — the point-in-time lookup (join events
  to the dim state that was current when the event happened). Implemented
  with the union trick: tag both sides, sort within key by (ts, side),
  carry the last right values forward with ``last(..., ignorenulls)`` over
  an unbounded-preceding window, keep left rows. One shuffle on the key.

- ``range_join``: points joined to containing [lo, hi] intervals without a
  nested loop: intervals explode into fixed-width buckets, points key into
  their bucket, the equi-join on bucket prunes candidates, and the exact
  containment filter runs on candidates only. Shuffle is keyed on bucket;
  cost scales with interval width / bucket_width (the IVF/LSH shape
  applied to 1-D ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Point-in-time join: each left row gets the most recent right row
    (per ``on`` key) whose ``ts_col`` <= the left row's. Right columns come
    back NULL when no prior right row exists (or it is older than
    ``tolerance_seconds``).

    Output: all left columns + ``right_cols`` (default: every non-key,
    non-ts right column) + ``matched_ts`` (the right row's timestamp).

    Caveats (same as DuckDB/pandas asof semantics): rename right columns
    that collide with left column names before joining (the output would
    carry duplicates); if the right side has multiple rows at the same
    (key, ts), which one wins is unspecified — pre-deduplicate to the
    intended row.
    """
    right_cols = (
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (on, ts_col)]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_lrow",
        "_ts",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("matched_ts"),
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("matched_ts").isNotNull()
            & (
                F.col("_ts").cast("long") - F.col("matched_ts").cast("long")
                <= tolerance_seconds
            )
        )
        carried = carried.select(
            "_lrow",
            *[
                F.when(in_tol, F.col(f"_c_{c}")).alias(f"_c_{c}")
                for c in right_cols
            ],
            F.when(in_tol, F.col("matched_ts")).alias("matched_ts"),
        )
    return carried.select(
        F.col("_lrow.*"),
        *[F.col(f"_c_{c}").alias(c) for c in right_cols],
        "matched_ts",
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join points to every interval containing them
    (``lo <= point <= hi``) via bucketed candidate generation.

    ``bucket_width`` trades replication for pruning: each interval appears
    in ceil(width / bucket_width) + 1 buckets; size it near the typical
    interval width. ``how='left'`` keeps unmatched points with NULL
    interval columns.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    contained = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if how == "inner":
        return pb.join(iv, "_bucket").filter(contained).drop("_bucket")
    if how == "left":
        matched = pb.join(iv, "_bucket").filter(contained).drop("_bucket")
        unmatched = pb.drop("_bucket").join(
            matched.select(*points.columns), points.columns, "left_anti"
        )
        for c in intervals.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType)
            )
        return matched.unionByName(unmatched)
    raise ValueError(f"range_join supports inner/left, got {how!r}")
