"""External/API connectors behind the same del/ins interface.

The reference wraps third-party exporters (coingecko, defillama,
wisdom-tree, stellar-expert, airtable) in a generic "run CLI, upload,
load" task (build_internal_export_task.py:26-108, callers
external_data_dag.py:93-236). The engine equivalent: a fetcher callable
returns row dicts on the driver (these feeds are KB-sized reference data,
never big), which become a DataFrame and flow through the same idempotent
ingest as every other source.

Network access is intentionally injected (``fetcher``): tests and offline
runs pass a canned fetcher; production passes an HTTP client. Secrets
resolution (utils.py:107-124) maps to environment variables here.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sinks import writer
from ..sources.ndjson import stamp_batch_columns
from .csvsrc import read_partner_csv  # noqa: F401  (same family, re-exported)
from ..session import local_df


def get_secret(name: str, default: str | None = None) -> str:
    """Secret Manager access -> environment variable convention."""
    val = os.environ.get(name, default)
    if val is None:
        raise KeyError(f"secret {name} not set")
    return val


def fetch_to_dataframe(
    spark: SparkSession,
    fetcher: Callable[[], list[dict]],
    schema: T.StructType,
) -> DataFrame:
    """Driver-side fetch -> schema-pinned DataFrame."""
    rows = fetcher()
    return local_df(spark, rows, schema, slices=4)


def ingest_external(
    spark: SparkSession,
    dest_path: str,
    fetcher: Callable[[], list[dict]],
    schema: T.StructType,
    batch_id: str,
    batch_run_date,
) -> DataFrame:
    """The external-source del/ins: fetch, stamp, idempotent overwrite of
    this batch's partitions."""
    df = stamp_batch_columns(fetch_to_dataframe(spark, fetcher, schema), batch_id, batch_run_date)
    writer.replace_batch(df, dest_path)
    return df
