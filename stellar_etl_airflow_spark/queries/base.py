"""Query-spec plumbing shared by the relational / training query corpora.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with an equivalent
ANSI-SQL oracle string that DuckDB can execute over the same parquet tables.
The driver (and ``tests/test_oracle_parity.py``) runs both and compares
row counts, schemas, and order-insensitive value hashes.

Cross-engine determinism rules used throughout the corpus:

- Aggregates over doubles (SUM/AVG) are wrapped in ``round(..., d)`` on BOTH
  sides; scalar double expressions are bit-reproducible across engines and
  left unrounded.
- ``PH(x)`` is the portable 60-bit hash ``conv(substr(md5(x),1,15),16,10)``
  (Spark) == ``('0x' || substr(md5(x),1,15))::BIGINT`` (DuckDB). It backs
  MinHash / SimHash / fingerprint oracles.
- Spark arrays are 0-indexed, DuckDB lists 1-indexed; oracles compensate.
- BQ ``EXTRACT(DAYOFWEEK)`` is 1=Sunday: Spark ``dayofweek`` matches, DuckDB
  needs ``dayofweek(x)+1``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One correctness-gated query: Spark builder + DuckDB oracle SQL.

    ``oracle`` is ``None`` for ops that are not SQL-expressible (streaming,
    stateful ingest); the driver then records a weaker rows-only check.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named driver-testdata parquet tables and register temp views.

    The session may be externally owned (the correctness driver builds its
    own), so the confs required to read the testdata — nanos-as-long for
    ``events.ts`` TIMESTAMP(NANOS) and a UTC session timezone for
    deterministic timestamp<->local conversions — are (re)applied here at
    runtime rather than assumed from :func:`..session.get_spark`.
    """
    from ..session import ensure_read_confs, normalize_nanos

    ensure_read_confs(spark)
    out = []
    for name in names:
        df = normalize_nanos(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))
        df.createOrReplaceTempView(name)
        out.append(df)
    return out


def dsum(col):
    """Exact, engine-independent SUM over a double column/expression.

    Summing doubles is order-dependent, so Spark (partial aggs over 32
    partitions) and DuckDB disagree in the last ulp — which flips rounded
    values that land exactly on a rounding boundary. Casting each addend to
    DECIMAL(38,6) makes the sum exact and bit-identical in both engines;
    the final cast back to double is a single deterministic rounding.
    SQL-side equivalent: CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE).
    """
    from pyspark.sql import functions as F

    return F.sum(col.cast("decimal(38,6)")).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


# Portable 60-bit hash (see module docstring). The salt lets MinHash derive
# K independent hash functions from one primitive.
def ph_spark(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def ph_duck(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
