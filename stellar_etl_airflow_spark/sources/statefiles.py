"""State-table export fan-out: one bounded-core run emits per-entity NDJSON
files into a common run folder, distinguished by filename suffix
(build_export_task.py:106-119; suffix map state_table_dag.py:139-151).

Spark side: one schema-enforced NDJSON read per entity from the shared
prefix — ``{run_dir}/*-accounts.txt`` etc.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas.registry import STATE_FILE_SUFFIXES
from .ndjson import read_ndjson


def state_file_glob(run_dir: str, table: str) -> str:
    suffix = STATE_FILE_SUFFIXES[table]
    return os.path.join(run_dir, f"*-{suffix}")


def read_state_exports(
    spark: SparkSession,
    run_dir: str,
    schemas: dict[str, T.StructType],
    tables: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Read every (present) state-entity file set from one export run."""
    out: dict[str, DataFrame] = {}
    for table in tables or list(STATE_FILE_SUFFIXES):
        pattern = state_file_glob(run_dir, table)
        if not glob.glob(pattern):
            continue
        out[table] = read_ndjson(spark, pattern, schemas[table])
    return out
