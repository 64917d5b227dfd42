"""Custom join operators Spark lacks natively: as-of join, range join.

Both are compositions of existing DataFrame ops (SURVEY §7.3 / project
brief: prefer composition over Pandas fallbacks when semantics allow), so
Catalyst owns the physical plan and both scale as ordinary keyed
shuffles — no cross products, no Python.

- ``asof_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key — the point-in-time lookup (join events
  to the dim state that was current when the event happened). Implemented
  with the union trick: tag both sides, sort within key by (ts, side),
  carry the last right ROW forward as one struct with
  ``last(..., ignorenulls)`` over an unbounded-preceding window, keep left
  rows. One shuffle on the key. The struct is carried atomically, so a
  matched row's NULL attribute can never be backfilled from an older row
  (each output row's values and matched_ts come from the same right row).

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

    SQL ON-equality semantics for NULLs (matches DuckDB ASOF): NULL join
    keys never match (left NULL-key rows come back unmatched; right
    NULL-key rows are ignored), and right rows with NULL ``ts_col`` can
    never be "prior" to anything, so they are ignored too.

    Caveats: rename right columns that collide with left column names
    before joining (the output would carry duplicates); if the right side
    has multiple rows at the same (key, ts), which one wins is unspecified
    — pre-deduplicate to the intended row.
    """
    right_cols = (
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (on, ts_col)]
    )
    # NULL-key left rows are unmatched by definition; set them aside and
    # union back at the end (a window partition would group NULL keys
    # together and fabricate matches).
    left_null_key = left.filter(F.col(on).isNull())
    left_ok = left.filter(F.col(on).isNotNull())
    right_ok = right.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull())

    rstruct = F.struct(
        F.col(ts_col).alias("matched_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_tagged = left_ok.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right_ok.select(rstruct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right_ok.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(l_tagged.schema["_lrow"].dataType)
        .alias("_lrow"),
        rstruct.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the whole right row carries as ONE value: values and matched_ts are
    # always from the same row, and a NULL attribute inside it stays NULL
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_lrow",
        "_ts",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # double-precision seconds: cast('long') would truncate sub-second
        # age and admit matches up to ~1s past the cutoff. Cast through
        # timestamp first — TIMESTAMP_NTZ -> DOUBLE is illegal in Spark 4.x
        # (VERDICT r03 #2).
        age = (
            F.col("_ts").cast("timestamp").cast("double")
            - F.col("_m.matched_ts").cast("timestamp").cast("double")
        )
        carried = carried.withColumn(
            "_m", F.when(age <= F.lit(float(tolerance_seconds)), F.col("_m"))
        )
    matched = carried.select(
        F.col("_lrow.*"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
        F.col("_m.matched_ts").alias("matched_ts"),
    )
    null_schema_cols = [
        F.lit(None).cast(right_ok.schema[c].dataType).alias(c) for c in right_cols
    ] + [F.lit(None).cast(right_ok.schema[ts_col].dataType).alias("matched_ts")]
    return matched.unionByName(left_null_key.select("*", *null_schema_cols))


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
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")

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

    # left: a unique surrogate id makes the unmatched anti-join null-safe
    # (anti-joining on the data columns would re-emit matched rows that
    # carry NULLs, since NULL = NULL is never true)
    pid = points.withColumn("_pid", F.monotonically_increasing_id())
    pb = pid.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    matched = pb.join(iv, "_bucket").filter(contained).drop("_bucket")
    unmatched = pid.join(matched.select("_pid"), "_pid", "left_anti").select(
        "*",
        *[
            F.lit(None).cast(intervals.schema[c].dataType).alias(c)
            for c in intervals.columns
        ],
    )
    return matched.unionByName(unmatched).drop("_pid")
