"""Warehouse catalog: registers every stored table as a temp view so the
SQL surface (sql_insert_job templates, ad-hoc spark.sql, the view library)
resolves bare table names — the engine's analog of the reference's
project.dataset namespace.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.ingest import Warehouse
from .operators.jobs import list_tables
from .sinks.writer import PART_COL


def load_warehouse(spark: SparkSession, wh: Warehouse, include_meta: bool = False) -> list[str]:
    """Register all warehouse tables (and optionally _meta.batch_runs) as
    temp views. Returns the registered names."""
    names = []
    for t in list_tables(wh):
        df = spark.read.parquet(wh.path(t))
        if PART_COL in df.columns:
            df = df.drop(PART_COL)
        df.createOrReplaceTempView(t)
        names.append(t)
    if include_meta:
        spark.read.parquet(wh.meta_path()).createOrReplaceTempView("batch_runs")
        names.append("batch_runs")
    return names
