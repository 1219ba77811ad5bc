"""Spark-SQL -> DuckDB-SQL transcription for oracle generation.

``translate_bq_sql`` (bqcompat) turns the reference's BigQuery dialect into
Spark SQL; this module turns THAT machine-shaped Spark SQL into the DuckDB
dialect so the same query can run as its own correctness oracle (the
driver's gate compares Spark vs DuckDB results). It intentionally covers
only the constructs ``translate_bq_sql`` emits — it is an oracle
transcriber, not a general Spark->DuckDB transpiler.

Dialect mappings with semantic notes:

- ``concat`` -> ``||`` chains: DuckDB's concat SKIPS NULL arguments while
  Spark/BQ propagate NULL; ``||`` propagates, matching the join-key
  semantics audit_log.sql relies on (NULL jobName -> NULL jobId -> no
  LEFT JOIN match).
- ``get(split(x, s), n)`` -> ``string_split(x, s)[n+1]``: DuckDB lists are
  1-based and out-of-bounds indexing yields NULL, matching SAFE_OFFSET.
- ``struct(a AS x, ...)`` -> ``struct_pack(x := a, ...)`` (DuckDB has no
  AS-alias form; unaliased args take their trailing identifier).
- ``extract(DAYOFWEEK ...)`` -> ``(extract(DOW ...) + 1)``: DuckDB DOW is
  0=Sunday, Spark/BQ DAYOFWEEK is 1=Sunday.
- ``timestampdiff(U, a, b)`` -> ``date_diff('u', a, b)``: DuckDB counts
  unit-boundary crossings while Spark counts elapsed whole units — equal
  whenever operands are whole multiples of the unit (callers must keep
  sub-unit parts out of fixtures; same caveat as q19's gap semantics).
- ``from_json(x, 'array<string>')`` -> JSON -> VARCHAR[] cast: both yield
  unquoted scalars / raw minified object text per element.
"""

from __future__ import annotations

import re

from .bqcompat import _collapse_ws, _rewrite_call

_NAME_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\bget_json_object\s*\(", re.I), "json_extract_string("),
    (re.compile(r"\bregexp_like\s*\(", re.I), "regexp_matches("),
    (re.compile(r"\barray_sort\s*\(", re.I), "list_sort("),
    (re.compile(r"\bcollect_list\s*\(", re.I), "list("),
    (re.compile(r"\btransform\s*\(", re.I), "list_transform("),
    (re.compile(r"\bfilter\s*\(", re.I), "list_filter("),
    (re.compile(r"\bsize\s*\(", re.I), "len("),
    (re.compile(r"\bbtrim\s*\(", re.I), "trim("),
    (re.compile(r"\bslice\s*\(", re.I), "list_slice("),
    (re.compile(r"\bsequence\s*\(", re.I), "generate_series("),
    (re.compile(r"\bCURRENT_DATE\s*\(\s*\)", re.I), "current_date"),
    (re.compile(r"(\bEXTRACT\s*\(\s*)DAYOFWEEK\b(\s+FROM\s+)(\w+)\s*\)", re.I), r"(\1DOW\2\3) + 1)"),
]

_MAKE_INTERVAL_FNS = ["to_years", "to_months", "to_weeks", "to_days", "to_hours", "to_minutes", "to_seconds"]


def _r_get(args):
    if len(args) == 2 and args[1].strip().isdigit():
        return f"({args[0]})[{int(args[1]) + 1}]"
    return None


def _r_split(args):
    return f"string_split({', '.join(args)})" if len(args) == 2 else None


def _r_from_json(args):
    if len(args) == 2 and args[1].strip().lower() == "'array<string>'":
        return f"CAST(CAST({args[0]} AS JSON) AS VARCHAR[])"
    return None


def _r_try_divide(args):
    return f"(({args[0]}) / nullif(({args[1]}), 0))" if len(args) == 2 else None


def _r_timestampdiff(args):
    if len(args) == 3:
        return f"date_diff('{args[0].strip().lower()}', {args[1]}, {args[2]})"
    return None


def _r_timestamp(args):
    return f"CAST({args[0]} AS TIMESTAMP)" if len(args) == 1 else None


def _r_make_interval(args):
    if len(args) == 7:
        hot = [(i, a) for i, a in enumerate(args) if a.strip() != "0"]
        if len(hot) == 1:
            idx, expr = hot[0]
            return f"{_MAKE_INTERVAL_FNS[idx]}(CAST({expr} AS BIGINT))"
    return None


def _r_regexp_2arg(name):
    def render(args):
        return f"{name}({args[0]}, {args[1]}, 1)" if len(args) == 2 else None

    return render


_AS_ALIAS = re.compile(r"^(?P<expr>.*\S)\s+AS\s+(?P<name>\w+)\s*$", re.I | re.S)
_TRAILING_IDENT = re.compile(r"(\w+)\s*$")


def _r_struct(args):
    parts = []
    for a in args:
        m = _AS_ALIAS.match(_collapse_ws(a))
        if m:
            # always quote: field names like `time`/`table` are DuckDB
            # keywords, and quoting preserves camelCase
            parts.append(f'"{m.group("name")}" := ({m.group("expr")})')
        else:
            ident = _TRAILING_IDENT.search(a.strip())
            if not ident:
                return None
            parts.append(f'"{ident.group(1)}" := ({a.strip()})')
    return f"struct_pack({', '.join(parts)})"


def _r_concat(args):
    return "(" + " || ".join(f"({a})" for a in args) + ")" if len(args) >= 2 else None


def _dq_to_sq(sql: str) -> str:
    """Spark treats "..." as string literals (BQ heritage); DuckDB treats
    them as identifiers. Convert to '...' — runs FIRST, before any rewrite
    introduces intentional "identifier" quoting."""
    out, i, n = [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n and sql[j] != "'":
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif ch == '"':
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            out.append("'" + sql[i + 1 : j].replace("'", "''") + "'")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def spark_sql_to_duckdb(sql: str) -> str:
    """Transcribe the Spark SQL emitted by ``translate_bq_sql`` (plus the
    thin wrapper projections the corpus adds) into DuckDB SQL."""
    out = _dq_to_sq(sql)
    out = _rewrite_call(out, "get", _r_get)
    out = _rewrite_call(out, "from_json", _r_from_json)
    out = _rewrite_call(out, "try_divide", _r_try_divide)
    out = _rewrite_call(out, "timestampdiff", _r_timestampdiff)
    out = _rewrite_call(out, "timestamp", _r_timestamp)
    out = _rewrite_call(out, "date", lambda args: f"CAST({args[0]} AS DATE)" if len(args) == 1 else None)
    out = _rewrite_call(out, "make_interval", _r_make_interval)
    out = _rewrite_call(out, "regexp_extract_all", _r_regexp_2arg("regexp_extract_all"))
    out = _rewrite_call(out, "regexp_extract", _r_regexp_2arg("regexp_extract"))
    out = _rewrite_call(out, "struct", _r_struct)
    out = _rewrite_call(out, "concat", _r_concat)
    out = _rewrite_call(out, "split", _r_split)
    for pat, repl in _NAME_RULES:
        out = pat.sub(repl, out)
    return out
