"""Idempotent batch ingest: the engine's core del/ins primitive.

Reproduces the reference's composite operator (delete batch, then load
NDJSON append — build_del_ins_from_gcs_to_bq_task.py:55-203, task wrapper
build_del_ins_operator.py:9-118) as one Spark job:

  read NDJSON (pinned schema, zero-bad-record gate)
    -> stamp batch columns
    -> dynamic-partition-overwrite the (month, batch_id) slice
    -> append a reconciliation row to the _meta batch-runs table
       (build_batch_stats.py:9-43).

Re-running the same batch replaces its own partitions and leaves every
other batch untouched — the FIXTURES.md replay property.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sinks import writer
from ..sources.ndjson import read_ndjson, stamp_batch_columns
from .batch import BatchWindow

BATCH_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType()),
        T.StructField("batch_run_date", T.TimestampNTZType()),
        T.StructField("start_ledger", T.LongType()),
        T.StructField("end_ledger", T.LongType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("batch_start", T.TimestampType()),
    ]
)


@dataclass
class Warehouse:
    """Filesystem-rooted table namespace (object-store prefix at scale)."""

    root: str

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def meta_path(self) -> str:
        return os.path.join(self.root, "_meta", "batch_runs")

    def recover(self) -> list[str]:
        """Restore directories left mid-swap by an interrupted
        :func:`..operators.merge.safe_overwrite` (a ``.bak-<name>`` dir with
        no ``<name>``). Walks the WHOLE tree, not just top-level tables —
        compaction swaps leaf partition dirs, so a crash can leave a backup
        nested arbitrarily deep. Call once at startup. Returns the
        root-relative paths recovered."""
        from .merge import BACKUP_PREFIX, recover_overwrite

        recovered = []
        if os.path.isdir(self.root):
            for dirpath, dirnames, _files in os.walk(self.root):
                for d in sorted(dirnames):
                    if d.startswith(BACKUP_PREFIX):
                        target = os.path.join(dirpath, d[len(BACKUP_PREFIX):])
                        if recover_overwrite(target):
                            recovered.append(os.path.relpath(target, self.root))
        return recovered


def record_batch_stats(
    spark: SparkSession, wh: Warehouse, window: BatchWindow, table: str, batch_start: datetime
) -> None:
    row = [(window.batch_id, window.batch_run_date, window.start_ledger, window.end_ledger, table, batch_start)]
    spark.createDataFrame(row, BATCH_RUNS_SCHEMA).write.mode("append").parquet(wh.meta_path())


def ingest_batch(
    spark: SparkSession,
    wh: Warehouse,
    table: str,
    src_path: str,
    schema: T.StructType,
    window: BatchWindow,
    partition_field: str = "batch_run_date",
    granularity: str = "month",
    cluster_fields: tuple[str, ...] = (),
    failed_transforms: int = 0,
    staging: bool = False,
) -> DataFrame:
    """The del/ins composite. Returns the stamped DataFrame that was
    written (for chaining into views/marts)."""
    batch_start = datetime.utcnow()
    df = read_ndjson(spark, src_path, schema, failed_transforms=failed_transforms)
    df = stamp_batch_columns(df, window.batch_id, window.batch_run_date)
    dest = wh.path(f"{table}_staging" if staging else table)
    writer.replace_batch(df, dest, partition_field, granularity, cluster_fields)
    record_batch_stats(spark, wh, window, table, batch_start)
    return df


def read_table(spark: SparkSession, wh: Warehouse, table: str) -> DataFrame:
    return spark.read.parquet(wh.path(table)).drop(writer.PART_COL)
