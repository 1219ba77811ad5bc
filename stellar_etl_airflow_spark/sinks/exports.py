"""Public export surface: Avro slices, NDJSON extract, copy/clone.

- Avro export: the reference renders EXPORT DATA OPTIONS(uri, format=avro,
  overwrite=true) AS SELECT <explicit cols> WHERE closed_at in [t0,t1)
  ORDER BY closed_at, into gs://.../avro/{table}/{YYYY}/{M}/{D}/{H:mm:ss}/*
  (build_bq_generate_avro_job_task.py:13-57, dags/queries/generate_avro/).
  Spark twin: filter -> select -> sortWithinPartitions -> write. A global
  ORDER BY is only a per-file ordering guarantee in a parallel writer, so
  we sort within partitions after range-partitioning on the sort key,
  matching the practical contract of the BigQuery export (SURVEY §7.2
  hard part b). This container lacks the spark-avro connector jar, so the
  writer falls back to parquet with the same layout and reports which
  format it used.
- NDJSON extract: dumps one table slice to a single JSON file
  (dbt_stellar_marts_dag.py:162-178, the DefiLlama tvl feed).
- copy / clone: WRITE_TRUNCATE table copy (build_copy_table_task.py:9-65)
  and the staging-refresh clone (dag_stellar_dbt_staging_refresh.py:83-88;
  time travel needs Delta/Iceberg — documented stub here).
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def avro_export_dir(root: str, table: str, run_ts: datetime) -> str:
    """The reference's directory scheme: {root}/{table}/{YYYY}/{M}/{D}/{H:mm:ss}."""
    return os.path.join(
        root, table, str(run_ts.year), str(run_ts.month), str(run_ts.day), run_ts.strftime("%H:%M:%S")
    )


def export_slice(
    df: DataFrame,
    columns: list[str],
    ts_col: str,
    t0,
    t1,
    dest: str,
    order_by: str | None = None,
) -> str:
    """Half-open time slice, explicit projection, ordered export. Returns
    the format actually written ('avro' or 'parquet' fallback)."""
    order_col = order_by or ts_col
    out = (
        df.filter((F.col(ts_col) >= F.lit(t0).cast("timestamp")) & (F.col(ts_col) < F.lit(t1).cast("timestamp")))
        .select(*columns)
        .repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
    )
    return write_avro_or_parquet(out, dest)


def write_avro_or_parquet(out: DataFrame, dest: str) -> str:
    """Write avro; fall back to parquet ONLY when the avro connector itself
    is absent. Any real write failure (permissions, disk, task errors)
    propagates. Returns the format actually written."""
    try:
        out.write.mode("overwrite").format("avro").save(dest)
        return "avro"
    except Exception as exc:
        msg = str(exc).lower()
        if "failed to find" in msg or "data_source_not_found" in msg or "classnotfound" in msg:
            out.write.mode("overwrite").parquet(dest)
            return "parquet"
        raise


def ndjson_extract(df: DataFrame, dest: str) -> None:
    """Single-file JSON dump (coalesce(1): the feed is one small mart)."""
    df.coalesce(1).write.mode("overwrite").json(dest)


def copy_table(spark: SparkSession, src_path: str, dest_path: str) -> None:
    """BQ copy job, WRITE_TRUNCATE disposition."""
    spark.read.parquet(src_path).write.mode("overwrite").parquet(dest_path)


def create_or_replace_view(spark: SparkSession, name: str, df: DataFrame) -> None:
    """CREATE OR REPLACE VIEW (dags/queries/create_view.sql:1-3)."""
    df.createOrReplaceTempView(name)
