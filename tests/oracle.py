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


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = [c.lower() for c in spark_df.columns]
    con = duck_connection(sf_dir)
    try:
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
