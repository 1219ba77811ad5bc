"""Partitioned table writer with the reference's physical layout.

- Time partitioning (MONTH/DAY) becomes a materialized partition column —
  Spark partitions on values, not declared transforms (SURVEY §1.3), so
  ``_p`` holds the truncated date string.
- Clustering becomes ``sortWithinPartitions`` before the write: parquet
  row-group min/max stats on the sorted columns then give the same data
  skipping BigQuery clustering provides (airflow_variables_prod.json:7-119).
- Idempotent batch replacement: we additionally partition on ``batch_id``
  so a re-run with dynamic partition overwrite replaces exactly the
  (month, batch) slice it writes — core-Spark equivalent of the reference's
  DELETE WHERE batch_run_date=X AND batch_id=Y + re-append
  (build_del_ins_from_gcs_to_bq_task.py:74-138), and of Delta replaceWhere.

At cluster scale the same code applies unchanged: partition columns prune
at the manifest level, and `spark.sql.sources.partitionOverwriteMode=dynamic`
(set in session.py) keeps untouched partitions intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import empty_df

PART_COL = "_p"
_FMT = {"month": "yyyy-MM", "day": "yyyy-MM-dd"}


def with_partition_col(df: DataFrame, field: str, granularity: str = "month") -> DataFrame:
    return df.withColumn(PART_COL, F.date_format(F.col(field), _FMT[granularity]))


def write_table(
    df: DataFrame,
    path: str,
    partition_field: str = "batch_run_date",
    granularity: str = "month",
    cluster_fields: tuple[str, ...] = (),
    by_batch: bool = True,
    mode: str = "append",
) -> None:
    out = with_partition_col(df, partition_field, granularity)
    part_cols = [PART_COL] + (["batch_id"] if by_batch else [])
    if cluster_fields:
        out = out.sortWithinPartitions(*[F.col(c) for c in cluster_fields])
    out.write.mode(mode).partitionBy(*part_cols).parquet(path)


def replace_batch(
    df: DataFrame,
    path: str,
    partition_field: str = "batch_run_date",
    granularity: str = "month",
    cluster_fields: tuple[str, ...] = (),
) -> None:
    """Idempotent del+ins: dynamic partition overwrite of exactly the
    (month, batch_id) partitions present in ``df``."""
    write_table(df, path, partition_field, granularity, cluster_fields, by_batch=True, mode="overwrite")


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def truncate_like(spark: SparkSession, df_schema, path: str) -> None:
    """TRUNCATE (dataset-reset, build_delete_data_for_reset_task.py:8-30):
    overwrite with an empty frame of the same schema."""
    empty_df(spark, df_schema).write.mode("overwrite").parquet(path)
