"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a QuerySpec's Spark plan and its DuckDB oracle over the same parquet
tables and compares row count, column names, and order-insensitive values
(exact for ints/strings/timestamps, exact for doubles too — the corpus
rounds every aggregate so both engines produce identical doubles).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 / 0.0 and render with full precision
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def canonical_rows(columns, rows):
    """Sort columns by name, then rows lexicographically -> list of tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in columns), out


def _duck_kind(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT":
        return "hugeint"  # pandas lowers INT128 to float64 — always a red flag
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST")):
        return "nested"
    return "str"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if dt.typeName().startswith("timestamp"):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return "str"


def kind_mismatches(spark_df, duck_described_cols) -> list[str]:
    """Per-column engine TYPE-KIND check (review r10 — the t60 root
    cause): this module's value compare goes through ``fetchall()``,
    where DuckDB HUGEINT arrives as a lossless Python int, but a
    pandas-based comparator (the driver) lowers HUGEINT to float64 and
    hashes ``18704.0`` against Spark's int64 ``18704`` — a red row that
    rows/values/schema-name checks all miss. DuckDB sums BIGINT into
    HUGEINT, so any uncast SUM window/aggregate in an oracle is exactly
    this trap. Comparing the two engines' declared type KINDS catches
    it at pytest time. ``duck_described_cols`` is ``DESCRIBE <sql>``
    output rows (the DB-API description only reports generic
    NUMBER/STRING classes — not enough to see HUGEINT)."""
    skinds = {f.name.lower(): _spark_kind(f.dataType) for f in spark_df.schema.fields}
    out = []
    for name, dtype in duck_described_cols:
        dk, sk = _duck_kind(str(dtype)), skinds.get(name.lower())
        if sk is not None and dk != sk:
            out.append(f"type-kind mismatch on {name}: spark={sk} duck={dtype}")
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = [c.lower() for c in spark_df.columns]
    con = duck_connection(sf_dir)
    try:
        described = [
            (r[0], r[1]) for r in con.execute("DESCRIBE " + oracle_sql).fetchall()
        ]
        problems.extend(kind_mismatches(spark_df, described))
        res = con.execute(oracle_sql)
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()

    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")

    _, s_canon = canonical_rows(scols, srows)
    _, d_canon = canonical_rows(dcols, drows)
    if s_canon != d_canon:
        s_only = [r for r in s_canon if r not in set(d_canon)][:5]
        d_only = [r for r in d_canon if r not in set(s_canon)][:5]
        problems.append(f"values differ; spark-only sample={s_only} duck-only sample={d_only}")
    return problems
