"""Batch sources and sinks beyond the parquet catalog.

- S8 delimited config source: the reference drives everything from
  ``:``-separated config/query files
  (/root/reference/FACT_AUTOMATION_FILE.sh:116-132,
   /root/reference/sample.sh:4-23) -> ``spark.read.option("sep", ...)``.
- S3 text scan: line-oriented part files of one (topic, partition, run)
  directory (/root/reference/Kafka_ArrivalToConform.sh:349-374) ->
  ``spark.read.text``.
- S4 per-run file sink with empty-batch suppression (T4): processed data
  lands in ``{topic}_{partition}_{run}/part-*`` and a zero-record batch
  must create NO directory
  (/root/reference/Kafka_ArrivalToConform.sh:286-318, naming :317).
- S5 conformed sink: lineage-stamped, partitioned by create_date /
  source_file_name (/root/reference/Kafka_ArrivalToConform.sh:481,536-539).
  The reference writes Avro into Hive; Spark's Avro writer lives in the
  external ``spark-avro`` module, so the format is a parameter — parquet by
  default here, ``format="avro"`` on clusters that ship the module.
- S9 audit sink lives in quality.append_audit.

Scale: every sink is a straight ``df.write`` — parallel, no driver
collects. The per-run directory naming gives the same idempotency unit the
reference uses: a rerun re-creates its own directory only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str = ":",
    names: list[str] | None = None,
    header: bool = False,
) -> DataFrame:
    """S8: delimited config/query file -> DataFrame (columns named
    ``names`` when given, else _c0.._cN)."""
    df = spark.read.option("sep", sep).option("header", str(header).lower()).csv(path)
    if names:
        df = df.toDF(*names)
    return df


def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """S3: line-oriented scan of a run directory (``value: string``)."""
    return spark.read.text(path)


def run_dir(base: str, topic: str, partition: int | str, run_id: int) -> str:
    """F7: the reference's ``{topic}_{partition}_{run_id}`` naming
    (Kafka_ArrivalToConform.sh:317)."""
    return os.path.join(base, f"{topic}_{partition}_{run_id}")


def write_run_dir(
    df: DataFrame,
    base: str,
    topic: str,
    partition: int | str,
    run_id: int,
    fmt: str = "parquet",
) -> str | None:
    """S4 + T4: write one batch to its per-run directory; suppress entirely
    when the batch is empty (no directory may exist for a zero-record run —
    the reference asserts this, Kafka_ArrivalToConform.sh:286-309).

    Returns the directory written, or None when suppressed. The emptiness
    probe is a cheap limit-1 scan, not a full count.
    """
    if df.isEmpty():
        return None
    target = run_dir(base, topic, partition, run_id)
    df.write.mode("overwrite").format(fmt).save(target)
    return target


def write_conformed(
    df: DataFrame,
    path: str,
    run_id: int,
    source_file_name: str = "unknown",
    fmt: str = "parquet",
    create_date: str | None = None,
) -> None:
    """S5: conformed-layer sink with lineage stamping and the reference's
    partition layout ``create_date=.../source_file_name=...``
    (Kafka_ArrivalToConform.sh:536-539). Dynamic partition overwrite makes
    re-running a (date, file) pair idempotent.

    ``create_date`` should come from the run's control record (stable per
    run id): the wall-clock default means a retry that crosses midnight
    lands in a NEW date partition and duplicates the data instead of
    replacing it — pass the original run's date when re-running.
    """
    date_col = (
        F.to_date(F.lit(create_date)) if create_date else F.current_date()
    )
    (
        df.withColumn("create_job_run_id", F.lit(run_id).cast("long"))
        .withColumn("create_date", date_col)
        .withColumn("source_file_name", F.lit(source_file_name))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("create_date", "source_file_name")
        .format(fmt)
        .save(path)
    )


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    predicate: str | None = None,
    properties: dict[str, str] | None = None,
):
    """S7 relational scan over JDBC — the reference reads its staging and
    dim tables from 4 Oracle connections (Kafka_MultipleTables.sh:204,
    Kafka_3NF.sh:234); this dev environment has no database, so the builder
    is CONSTRUCTED and option-tested but executed only on clusters with a
    JDBC driver on the classpath (same pattern as the Kafka source
    builders in streaming/ingest.py).

    Returns an un-loaded ``DataFrameReader`` — call ``.load()`` where a
    database exists. Scale notes baked into the options:

    - ``partitionColumn``/bounds/``numPartitions`` split the scan into
      parallel range queries (without them a JDBC read is ONE task — the
      classic single-connection bottleneck);
    - ``fetchsize`` batches row transfer (Oracle's default 10 rows would
      round-trip per-row at 100 TB);
    - a pushed ``predicate`` lands in the generated WHERE clause
      database-side, mirroring Catalyst's filter pushdown on parquet.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({predicate}) src" if predicate else table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
):
    """S7 relational sink over JDBC (the reference's conform->staging Oracle
    loads, KafkaScript_ConformToStaging.sh). Returns an un-saved
    ``DataFrameWriter`` — call ``.save()`` where a database exists.

    ``batchsize`` controls rows per INSERT round-trip; ``num_partitions``
    caps concurrent connections (a 1000-executor write would otherwise open
    1000 sessions against the database)."""
    out = df.coalesce(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
