"""BigQuery-dialect compatibility layer (SURVEY §7.2).

Two surfaces:

1. Column helpers — the named translations for expressions the reference
   uses heavily (dags/queries/audit_log.sql and the ddls views):
   SAFE_DIVIDE, TIMESTAMP_DIFF, JSON_EXTRACT_SCALAR/ARRAY, the
   1=Sunday DAYOFWEEK convention.
2. ``translate_bq_sql`` — a pragmatic string-level translator for the
   SQL-file insert-job path (operators/jobs.py::sql_insert_job), covering
   the function renames that appear in the reference's query corpus.
   It is NOT a full BQ parser: project.dataset.table references are
   rewritten to bare table names (resolved against registered views) and
   the documented function family is mapped; anything else passes through
   for Spark SQL (whose ANSI dialect overlaps BQ on the rest of the
   corpus — CASE/COALESCE/window functions/CONCAT/TRIM are identical).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_MS_UNITS = {"MILLISECOND": 1, "SECOND": 1000, "MINUTE": 60_000, "HOUR": 3_600_000}


def safe_divide(n: Column, d: Column) -> Column:
    """BQ SAFE_DIVIDE: NULL on zero/NULL denominator."""
    return n / F.nullif(d, F.lit(0))


def timestamp_diff(a: Column, b: Column, unit: str) -> Column:
    """BQ TIMESTAMP_DIFF(a, b, unit) = a - b in whole units."""
    ms = F.unix_millis(a.cast("timestamp")) - F.unix_millis(b.cast("timestamp"))
    try:
        return (ms / F.lit(_MS_UNITS[unit.upper()])).cast("long")
    except KeyError:
        raise ValueError(f"unsupported TIMESTAMP_DIFF unit: {unit}") from None


def json_extract_scalar(col: Column, path: str) -> Column:
    return F.get_json_object(col, path)


def json_extract_array(col: Column, path: str = "$") -> Column:
    """BQ JSON_EXTRACT_ARRAY -> from_json array<string> of the raw items."""
    target = F.get_json_object(col, path) if path != "$" else col
    return F.from_json(target, "array<string>")


def bq_dayofweek(col: Column) -> Column:
    """BQ EXTRACT(DAYOFWEEK): 1=Sunday — Spark's dayofweek already agrees;
    kept as a named helper so the convention is explicit at call sites."""
    return F.dayofweek(col)


# ---------------------------------------------------------------------------
# String-level SQL translation
# ---------------------------------------------------------------------------

_RULES: list[tuple[re.Pattern, str]] = [
    # `project.dataset.table` (backticked) -> bare table name; backticks are
    # unambiguous BQ table quoting, so this applies anywhere.
    (re.compile(r"`[\w\-]+\.[\w\-]+\.([\w\-]+)`"), r"\1"),
    # Bare project.dataset.table: ONLY in table position (after FROM/JOIN/
    # INTO/UPDATE/TABLE). A global 3-part rewrite would corrupt struct
    # field paths — `resource.labels.project_id`, `a.details.liquidity_
    # pool_id` — which the reference's audit_log.sql uses in SELECT/WHERE.
    (
        re.compile(r"\b(FROM|JOIN|INTO|UPDATE|TABLE)(\s+)[\w\-]+\.[\w\-]+\.([\w\-]+)\b", re.I),
        r"\1\2\3",
    ),
    (re.compile(r"\bSAFE_DIVIDE\s*\(", re.I), "try_divide("),
    (re.compile(r"\bSAFE_CAST\s*\(", re.I), "try_cast("),
    (re.compile(r"\bJSON_EXTRACT_SCALAR\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bJSON_EXTRACT\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bREGEXP_CONTAINS\s*\(", re.I), "regexp_like("),
    (re.compile(r"\bFORMAT\s*\(", re.I), "format_string("),
    (re.compile(r"\bARRAY_LENGTH\s*\(", re.I), "size("),
    (re.compile(r"\bGENERATE_ARRAY\s*\(", re.I), "sequence("),
    (re.compile(r"\bARRAY_CONCAT\s*\(", re.I), "concat("),
    (re.compile(r"\bIFNULL\s*\(", re.I), "coalesce("),
    # TIMESTAMP_ADD first: it nests inside TIMESTAMP_DIFF in the corpus,
    # and the translated form is comma-free so the DIFF rule below can
    # split arguments lazily. (Arguments containing commas are the
    # documented limitation of the string-level translator.)
    (
        re.compile(r"\bTIMESTAMP_ADD\s*\(\s*(.+?)\s*,\s*INTERVAL\s+(\d+)\s+(\w+)\s*\)", re.I),
        r"(\1 + INTERVAL \2 \3)",
    ),
    # TIMESTAMP_DIFF(a, b, unit) -> timestampdiff(unit, b, a)
    (
        re.compile(r"\bTIMESTAMP_DIFF\s*\(\s*(.+?)\s*,\s*(.+?)\s*,\s*(\w+)\s*\)", re.I),
        r"timestampdiff(\3, \2, \1)",
    ),
    (re.compile(r"\bTIMESTAMP_TRUNC\s*\(\s*(.+?)\s*,\s*(\w+)\s*\)", re.I), r"date_trunc('\2', \1)"),
    # SPLIT(x, s)[SAFE_OFFSET(n)] -> get(split(x, s), n)
    (
        re.compile(r"\bSPLIT\s*\(\s*(.+?)\s*,\s*('.+?')\s*\)\s*\[\s*SAFE_OFFSET\s*\(\s*(\d+)\s*\)\s*\]", re.I),
        r"get(split(\1, \2), \3)",
    ),
]


def translate_bq_sql(sql: str) -> str:
    """Translate the documented BQ function families to Spark SQL. Covers
    the constructs appearing in the reference corpus (SURVEY §2.4); not a
    general-purpose transpiler."""
    out = sql
    for pat, repl in _RULES:
        out = pat.sub(repl, out)
    return out
