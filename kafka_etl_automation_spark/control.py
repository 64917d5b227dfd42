"""Control plane: job registry + incremental high-water-mark windows.

Spark-native re-expression of the reference's ``JOB_PROCESS_CONTROL`` /
``JOB_PROCESS_CONTROL_SRC`` machinery:

- run registry with allocation + completion status
  (/root/reference/KafkaScript_ConformToStaging.sh:76-121,
   /root/reference/Kafka_ArrivalToConform.sh:84-112,197-207)
- high-water-mark consumption windows: a downstream job consumes only
  source runs with ``job_run_id > max consumed`` and records the window it
  took (/root/reference/Kafka_MultipleTables.sh:76-121,
   /root/reference/fact_dim_merging.sh:46-110)
- the ``0,0 -> NO RECORDS AVAILABLE TO PROCESS`` short-circuit
  (/root/reference/KafkaScript_ConformToStaging.sh:113-121)
- reprocess flagging (M2, /root/reference/rerunnability.sh:85-89)

Storage is a directory of tiny parquet tables (the control plane is
metadata — KBs even when the data plane is 100 TB; full-overwrite writes of
these tables are deliberate and cheap, and keep the engine free of any
external transactional dependency). All *data-plane* reads driven by the
window are ordinary pushed-down parquet scans: ``job_run_id > hwm`` prunes
at the scan, which is exactly the behavior that matters at scale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_SCHEMA = T.StructType(
    [
        T.StructField("job_name", T.StringType(), False),
        T.StructField("job_run_id", T.LongType(), False),
        T.StructField("job_run_status", T.IntegerType(), False),  # 1=success
        T.StructField("job_start_ts", T.TimestampType(), True),
        T.StructField("job_end_ts", T.TimestampType(), True),
        T.StructField("reprocess_flag", T.IntegerType(), False),
        T.StructField("records_processed", T.LongType(), True),
    ]
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("job_name", T.StringType(), False),
        T.StructField("job_run_id", T.LongType(), False),
        T.StructField("src_job_name", T.StringType(), False),
        T.StructField("min_src_run_id", T.LongType(), False),
        T.StructField("max_src_run_id", T.LongType(), False),
    ]
)


@dataclass(frozen=True)
class HwmWindow:
    """Consumption window [min_run_id, max_run_id]; (0, 0) = nothing new."""

    min_run_id: int
    max_run_id: int

    @property
    def empty(self) -> bool:
        # "NO RECORDS AVAILABLE TO PROCESS" short-circuit
        # (KafkaScript_ConformToStaging.sh:113-121).
        return self.min_run_id == 0 and self.max_run_id == 0


class JobRegistry:
    """Run registry backed by parquet control tables under ``root``.

    The registry is driver-side by design: allocation and status updates are
    single-row metadata operations (the reference does them as single Oracle
    DML statements); only window *application* touches the data plane.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- storage ------------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _read(self, name: str, schema: T.StructType) -> DataFrame:
        path = self._path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def _overwrite(self, df: DataFrame, name: str) -> None:
        # Write to a sibling temp dir then swap: keeps a reader from ever
        # seeing a half-written control table without needing a table format.
        final = self._path(name)
        tmp = final + "__tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = final + "__old"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)

    def control(self) -> DataFrame:
        return self._read("job_process_control", CONTROL_SCHEMA)

    def control_src(self) -> DataFrame:
        return self._read("job_process_control_src", SRC_SCHEMA)

    # -- run lifecycle ------------------------------------------------------

    def start_run(self, job_name: str) -> int:
        """Allocate the next run id for ``job_name`` and record it running
        (status 0). NVL(MAX(job_run_id),0)+1, as the reference computes it
        (Kafka_MultipleTables.sh:101-105)."""
        ctl = self.control()
        row = (
            ctl.filter(F.col("job_name") == job_name)
            .agg(F.coalesce(F.max("job_run_id"), F.lit(0)).alias("mx"))
            .first()
        )
        run_id = int(row["mx"]) + 1
        new = self.spark.createDataFrame(
            [
                Row(
                    job_name=job_name,
                    job_run_id=run_id,
                    job_run_status=0,
                    job_start_ts=None,
                    job_end_ts=None,
                    reprocess_flag=0,
                    records_processed=None,
                )
            ],
            CONTROL_SCHEMA,
        ).withColumn("job_start_ts", F.current_timestamp())
        self._overwrite(ctl.unionByName(new), "job_process_control")
        return run_id

    def finish_run(
        self, job_name: str, run_id: int, status: int = 1, records: int | None = None
    ) -> None:
        """Mark a run finished (job_run_status=1 success / 2 failed) and
        stamp job_end_ts — the reference's post-load control UPDATE
        (KafkaScript_ConformToStaging.sh:186-199)."""
        ctl = self.control()
        hit = (F.col("job_name") == job_name) & (F.col("job_run_id") == run_id)
        updated = (
            ctl.withColumn(
                "job_run_status",
                F.when(hit, F.lit(status)).otherwise(F.col("job_run_status")),
            )
            .withColumn(
                "job_end_ts",
                F.when(hit, F.current_timestamp()).otherwise(F.col("job_end_ts")),
            )
            .withColumn(
                "records_processed",
                F.when(hit, F.lit(records).cast("long")).otherwise(
                    F.col("records_processed")
                ),
            )
        )
        self._overwrite(updated, "job_process_control")

    def latest_success(self, job_name: str) -> int | None:
        """Latest successful run id — the W1 ROW_NUMBER 'current state'
        lookup (Kafka_ArrivalToConform.sh:101-108)."""
        w = Window.partitionBy("job_name").orderBy(
            F.desc("job_end_ts"), F.desc("job_run_id")
        )
        row = (
            self.control()
            .filter((F.col("job_name") == job_name) & (F.col("job_run_status") == 1))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .first()
        )
        return None if row is None else int(row["job_run_id"])

    def run_status(self, job_name: str, run_id: int) -> int | None:
        """Q5 run-status validation (Kafka_ArrivalToConform.sh:197-207)."""
        row = (
            self.control()
            .filter((F.col("job_name") == job_name) & (F.col("job_run_id") == run_id))
            .select("job_run_status")
            .first()
        )
        return None if row is None else int(row["job_run_status"])

    def mark_reprocess(self, job_name: str, run_id: int) -> None:
        """M2: UPDATE ... SET REPROCESS_FLAG=1 (rerunnability.sh:85-89)."""
        ctl = self.control()
        hit = (F.col("job_name") == job_name) & (F.col("job_run_id") == run_id)
        self._overwrite(
            ctl.withColumn(
                "reprocess_flag",
                F.when(hit, F.lit(1)).otherwise(F.col("reprocess_flag")),
            ),
            "job_process_control",
        )

    # -- incremental windows (T6) -------------------------------------------

    def hwm_window(self, job_name: str, src_job_name: str) -> HwmWindow:
        """Compute the next consumption window over the source job's
        successful runs: (min, max) of source run ids strictly above the
        high-water mark this job last consumed; (0, 0) when nothing new.

        Mirrors KafkaScript_ConformToStaging.sh:76-121: MAX_SRC_JOB_RUN_ID
        from JOB_PROCESS_CONTROL_SRC, then NVL(MIN/MAX over newer source
        runs, 0).
        """
        consumed = (
            self.control_src()
            .filter(
                (F.col("job_name") == job_name)
                & (F.col("src_job_name") == src_job_name)
            )
            .agg(F.coalesce(F.max("max_src_run_id"), F.lit(0)).alias("hwm"))
            .first()
        )
        hwm = int(consumed["hwm"])
        avail = (
            self.control()
            .filter(
                (F.col("job_name") == src_job_name)
                & (F.col("job_run_status") == 1)
                & (F.col("job_run_id") > hwm)
            )
            .agg(
                F.coalesce(F.min("job_run_id"), F.lit(0)).alias("lo"),
                F.coalesce(F.max("job_run_id"), F.lit(0)).alias("hi"),
            )
            .first()
        )
        return HwmWindow(int(avail["lo"]), int(avail["hi"]))

    def record_consumed(
        self, job_name: str, run_id: int, src_job_name: str, window: HwmWindow
    ) -> None:
        """Advance the high-water mark: remember the window this run took."""
        new = self.spark.createDataFrame(
            [
                Row(
                    job_name=job_name,
                    job_run_id=run_id,
                    src_job_name=src_job_name,
                    min_src_run_id=window.min_run_id,
                    max_src_run_id=window.max_run_id,
                )
            ],
            SRC_SCHEMA,
        )
        self._overwrite(
            self.control_src().unionByName(new), "job_process_control_src"
        )


def apply_window(df: DataFrame, window: HwmWindow, run_col: str = "job_run_id") -> DataFrame:
    """Restrict a data-plane frame to the consumption window.

    The BETWEEN lands in PushedFilters on a parquet scan, so at 100 TB only
    the new runs' row groups are read (consumption window in
    /root/reference/query.txt:2: ``update_job_run_id >= MIN and <= MAX``).
    """
    return df.filter(F.col(run_col).between(window.min_run_id, window.max_run_id))
