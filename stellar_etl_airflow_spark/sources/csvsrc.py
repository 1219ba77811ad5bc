"""Partner CSV drops: sensor-style file arrival + schema-enforced CSV load.

The reference waits for a ``prefix_{YYYYMMDD}`` object, then loads with
``skip_leading_rows=1`` and WRITE_TRUNCATE (partner_pipeline_dag.py:47-73);
a variant picks the latest file by modification time
(ext_stellar_partner_pipeline_dag.py:21-38,83-99).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def find_dated_file(dirpath: str, prefix: str, yyyymmdd: str) -> str | None:
    """File-arrival check for the dated-drop convention."""
    hits = sorted(glob.glob(os.path.join(dirpath, f"{prefix}_{yyyymmdd}*")))
    return hits[0] if hits else None


def latest_file_by_mtime(dirpath: str, prefix: str = "") -> str | None:
    """Latest-drop selection (max mtime), the ext-partner variant."""
    hits = [p for p in glob.glob(os.path.join(dirpath, f"{prefix}*")) if os.path.isfile(p)]
    return max(hits, key=os.path.getmtime) if hits else None


def read_partner_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Headered CSV with pinned schema (skip_leading_rows=1 == header)."""
    return spark.read.schema(schema).option("header", True).option("mode", "FAILFAST").csv(path)
