"""Small-file compaction: fewer files, identical data, partition layout
preserved."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_etl_automation_spark import maintenance


def test_compact_flat_table(spark, tmp_root):
    path = os.path.join(tmp_root, "t")
    # 20 tiny files
    spark.range(2000).repartition(20).write.parquet(path)
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())
    b, a = maintenance.compact(spark, path, target_mb=256)
    assert b == 20 and a < b
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before_rows


def test_compact_autodetects_partition_layout(spark, tmp_root):
    """Compacting a hive-partitioned table WITHOUT naming the partition
    column must preserve the layout, not flatten it (code-review r02)."""
    path = os.path.join(tmp_root, "t")
    df = spark.range(90).select(F.col("id"), (F.col("id") % 3).alias("run"))
    df.repartition(6).write.partitionBy("run").parquet(path)
    maintenance.compact(spark, path, target_mb=256)  # no partition_col
    assert sorted(
        d for d in os.listdir(path) if d.startswith("run=")
    ) == ["run=0", "run=1", "run=2"]
    assert spark.read.parquet(path).count() == 90


def test_compact_rejects_wrong_partition_col(spark, tmp_root):
    import pytest

    path = os.path.join(tmp_root, "t")
    spark.range(10).select(F.col("id"), (F.col("id") % 2).alias("run")).write.partitionBy("run").parquet(path)
    with pytest.raises(ValueError, match="partitioned by 'run'"):
        maintenance.compact(spark, path, partition_col="other")


def test_compact_partitioned_table(spark, tmp_root):
    path = os.path.join(tmp_root, "t")
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).alias("run")
    )
    df.repartition(10).write.partitionBy("run").parquet(path)
    b, a = maintenance.compact(spark, path, target_mb=256, partition_col="run")
    assert a < b
    back = spark.read.parquet(path)
    assert back.count() == 300
    # partition dirs survive (pruning layout intact)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("run=")
    ) == ["run=0", "run=1", "run=2"]


def test_compact_recovers_stranded_table(spark, tmp_root):
    """Crash between the two swap renames leaves data under __precompact;
    recover() (called by compact) restores it before anything else."""
    import os

    from kafka_etl_automation_spark import maintenance

    path = os.path.join(tmp_root, "t")
    spark.range(100).write.parquet(path)
    os.rename(path, path + "__precompact")  # simulate the crash window
    assert maintenance.recover(path) is True
    assert spark.read.parquet(path).count() == 100
    # and compact itself self-heals when called on a stranded table
    os.rename(path, path + "__precompact")
    b, a = maintenance.compact(spark, path, target_mb=256)
    assert spark.read.parquet(path).count() == 100
