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
    # BQ type names inside CAST/try_cast
    (re.compile(r"\bAS\s+INT64\b", re.I), "AS BIGINT"),
    (re.compile(r"\bAS\s+FLOAT64\b", re.I), "AS DOUBLE"),
    (re.compile(r"\bAS\s+BOOL\b", re.I), "AS BOOLEAN"),
    # BQ DATETIME (civil time) -> TIMESTAMP (sessions run UTC; the
    # reference's update_table.sql casts its render param this way)
    (re.compile(r"\bAS\s+DATETIME\b", re.I), "AS TIMESTAMP"),
    # EXTRACT field spelling: BQ DAYOFYEAR = Spark DOY (WEEK/QUARTER/
    # DAYOFWEEK/MINUTE/... agree natively; BQ WEEK is Sunday-based week-of-
    # year while Spark/DuckDB use ISO weeks — documented divergence)
    (re.compile(r"(\bEXTRACT\s*\(\s*)DAYOFYEAR\b", re.I), r"\1DOY"),
    (re.compile(r"\bSAFE_DIVIDE\s*\(", re.I), "try_divide("),
    (re.compile(r"\bSAFE_CAST\s*\(", re.I), "try_cast("),
    (re.compile(r"\bJSON_EXTRACT_SCALAR\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bJSON_EXTRACT\s*\(", re.I), "get_json_object("),
    (re.compile(r"\bREGEXP_CONTAINS\s*\(", re.I), "regexp_like("),
    (re.compile(r"\bFORMAT\s*\(", re.I), "format_string("),
    (re.compile(r"\bARRAY_LENGTH\s*\(", re.I), "size("),
    (re.compile(r"\bARRAY_CONCAT\s*\(", re.I), "concat("),
    (re.compile(r"\bIFNULL\s*\(", re.I), "coalesce("),
    (re.compile(r"\bCOUNTIF\s*\(", re.I), "count_if("),
    (re.compile(r"\bLOGICAL_AND\s*\(", re.I), "bool_and("),
    (re.compile(r"\bLOGICAL_OR\s*\(", re.I), "bool_or("),
    (re.compile(r"\bSTARTS_WITH\s*\(", re.I), "startswith("),
    (re.compile(r"\bENDS_WITH\s*\(", re.I), "endswith("),
    (re.compile(r"\bTO_HEX\s*\(", re.I), "hex("),
    (re.compile(r"\bSAFE_ADD\s*\(", re.I), "try_add("),
    (re.compile(r"\bSAFE_SUBTRACT\s*\(", re.I), "try_subtract("),
    (re.compile(r"\bSAFE_MULTIPLY\s*\(", re.I), "try_multiply("),
    (re.compile(r"\bARRAY_TO_STRING\s*\(", re.I), "array_join("),
    (re.compile(r"\bARRAY_REVERSE\s*\(", re.I), "reverse("),
    # ANY_VALUE / STRING_AGG / UNIX_SECONDS / UNIX_MILLIS / MOD / LEFT /
    # RIGHT / INSTR / LAST_DAY exist under the same names in Spark 4 —
    # no rule needed.
]

_SAFE_OFFSET_IDX = re.compile(r"\s*\[\s*SAFE_OFFSET\s*\(\s*(\d+)\s*\)\s*\]", re.I)
_SPLIT_CALL = re.compile(r"\bSPLIT\s*\(", re.I)


def _rewrite_safe_offset(sql: str) -> str:
    """SPLIT(x, s)[SAFE_OFFSET(n)] -> get(split(x, s), n). The call's
    closing paren is found by balance (arguments span lines and contain
    nested calls in audit_log.sql), never by regex — a dot-matches-newline
    pattern can lazily pair one CTE's SPLIT with a later CTE's
    SAFE_OFFSET and corrupt everything in between."""
    pos = 0
    while True:
        m = _SPLIT_CALL.search(sql, pos)
        if not m:
            return sql
        depth, i, n = 1, m.end(), len(sql)
        while i < n and depth:
            ch = sql[i]
            if ch in "'\"":
                q = ch
                i += 1
                while i < n and sql[i] != q:
                    i += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            return sql
        mi = _SAFE_OFFSET_IDX.match(sql, i)
        if not mi:
            pos = m.end()
            continue
        inner = sql[m.end() : i - 1].strip()
        sql = sql[: m.start()] + f"get(split({inner}), {mi.group(1)})" + sql[mi.end() :]
        pos = m.start()


def _skip_string(s: str, i: int) -> int:
    """``s[i]`` is a quote char: return the index of its closing quote.
    Handles doubled-quote escapes ('' / "") and backslash escapes (BQ
    string literals allow both quote chars and backslash escaping)."""
    q, n = s[i], len(s)
    i += 1
    while i < n:
        if s[i] == "\\":
            i += 2
            continue
        if s[i] == q:
            if i + 1 < n and s[i + 1] == q:
                i += 2
                continue
            return i
        i += 1
    return n - 1


def _split_args(argstr: str) -> list[str]:
    """Split a function-argument string on top-level commas only (tracks
    paren/bracket depth and skips string literals in either quote style —
    a bracket inside ``"["`` is text, not nesting)."""
    args, depth, start, i, n = [], 0, 0, 0, len(argstr)
    while i < n:
        ch = argstr[i]
        if ch in "'\"":
            i = _skip_string(argstr, i)
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(argstr[start:i].strip())
            start = i + 1
        i += 1
    args.append(argstr[start:].strip())
    return args


def _rewrite_call(sql: str, fname: str, render) -> str:
    """Replace every ``fname( ... )`` call in ``sql``, matching the closing
    paren by balance (regex alone can't — arguments may contain commas and
    nested calls). ``render(args: list[str]) -> str | None`` builds the
    output (None = leave the call as-is). Inner calls are handled because
    scanning restarts on the rewritten text after each replacement
    (inner-most first via rightmost match)."""
    pat = re.compile(rf"\b{fname}\s*\(", re.I)
    keep = "\x00"  # sentinel guards kept-as-is calls from re-matching
    while True:
        matches = list(pat.finditer(sql))
        if not matches:
            return sql.replace(keep, "")
        m = matches[-1]  # rightmost occurrence = inner-most on nesting
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] in "'\"":
                i = _skip_string(sql, i)
            elif sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced: leave the remainder untouched
            return sql.replace(keep, "")
        args = _split_args(sql[m.end() : i - 1])
        out = render(args)
        if out is None:
            # break the function name with the sentinel so it can't re-match
            out = sql[m.start()] + keep + sql[m.start() + 1 : i]
        sql = sql[: m.start()] + out + sql[i:]


def _normalize_raw_strings(sql: str) -> str:
    """BQ raw string literals r'...' / r"..." -> normal literals with the
    backslashes doubled (Spark's literal parser processes escapes; BQ raw
    strings do not). BQ raw strings cannot contain their own quote char, so
    a scan to the next quote is exact."""
    out, i, n = [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in "rR" and i + 1 < n and sql[i + 1] in "'\"" and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            q = sql[i + 1]
            j = sql.index(q, i + 2)
            out.append(q + sql[i + 2 : j].replace("\\", "\\\\") + q)
            i = j + 1
        elif ch in "'\"":
            j = i + 1
            while j < n and sql[j] != ch:
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_TRAILING_COMMA_FROM = re.compile(r",(\s*)(FROM\b)", re.I)
_TRAILING_COMMA_PAREN = re.compile(r",(\s*\))")


def _collapse_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces outside string literals."""
    out, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            j = i + 1
            while j < n and s[j] != ch:
                j += 1
            out.append(s[i : j + 1])
            i = j + 1
        elif ch.isspace():
            out.append(" ")
            while i < n and s[i].isspace():
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _find_top(s: str, token: str) -> int:
    """Index of ``token`` (case-insensitive) at paren depth 0 outside string
    literals, or -1."""
    depth, i, n, tl = 0, 0, len(s), len(token)
    low = s.lower()
    tok = token.lower()
    while i < n:
        ch = s[i]
        if ch in "'\"":
            i += 1
            while i < n and s[i] != ch:
                i += 1
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and low.startswith(tok, i):
            return i
        i += 1
    return -1


def _array_agg(args: list[str]) -> str | None:
    """ARRAY_AGG(expr [IGNORE NULLS] [ORDER BY key]) -> Spark. The ordered
    form packs (key, value) structs, sorts, and unpacks — array_sort on
    structs orders by the first field (audit_log.sql:366-391 shape). BQ's
    IGNORE NULLS becomes a post-filter so genuine NULLs in the sort key
    still order deterministically."""
    if len(args) != 1:
        return None
    a = _collapse_ws(args[0])
    ignore = False
    k = _find_top(a, " ignore nulls")
    if k >= 0:
        ignore = True
        a = a[:k] + a[k + len(" ignore nulls") :]
    key = None
    k = _find_top(a, " order by ")
    if k >= 0:
        key = a[k + len(" order by ") :].strip()
        a = a[:k]
    expr = a.strip()
    if key is None:
        return f"array_agg({expr})"
    out = f"transform(array_sort(collect_list(struct(({key}) AS _o, ({expr}) AS _v))), s -> s._v)"
    if ignore:
        out = f"filter({out}, _x -> _x IS NOT NULL)"
    return out


_ARRAY_SUBQUERY = re.compile(
    r"^\s*SELECT\s+(?P<proj>.*)\s+FROM\s+UNNEST\s*\((?P<arr>.*)\)\s+AS\s+(?P<var>\w+)\s*$",
    re.I | re.S,
)


def _array_subquery(args: list[str]) -> str | None:
    """Correlated ARRAY(SELECT expr FROM UNNEST(arr) AS var) ->
    transform(arr, var -> expr) (audit_log.sql:466-475: the per-minute
    slot-bucketing timeline). Spark lambda bodies may reference outer
    columns, which covers the correlated case."""
    if len(args) != 1:
        return None
    m = _ARRAY_SUBQUERY.match(args[0])
    if not m:
        return None  # plain ARRAY(...) constructor: keep
    return f"transform(({m.group('arr')}), {m.group('var')} -> ({m.group('proj').strip()}))"


_INTERVAL = re.compile(r"^INTERVAL\s+(\d+)\s+(\w+)$", re.I)

_DT_UNITS = {
    "MICROSECOND", "MILLISECOND", "SECOND", "MINUTE", "HOUR",
    "DAY", "WEEK", "MONTH", "QUARTER", "YEAR",
}

# BQ %-style strftime tokens -> Spark/Java datetime pattern letters.
# Unknown tokens pass through untouched (documented translator limit).
_BQ_FMT_TOKENS = [
    ("%F", "yyyy-MM-dd"),
    ("%T", "HH:mm:ss"),
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%e", "d"),
]


def _bq_fmt_to_java(fmt: str) -> str:
    for tok, java in _BQ_FMT_TOKENS:
        fmt = fmt.replace(tok, java)
    return fmt


def _apply_timestamp_rules(sql: str) -> str:
    """Balanced-paren rewrites for the BQ timestamp family (arguments may
    themselves contain commas / nested calls — TIMESTAMP_ADD nests inside
    TIMESTAMP_DIFF in the reference's audit_log.sql)."""

    def ts_add(args):
        if len(args) == 2:
            iv = _INTERVAL.match(args[1])
            if iv:
                return f"({args[0]} + INTERVAL {iv.group(1)} {iv.group(2)})"
            # variable interval count (audit_log.sql:469 INTERVAL bucket_num
            # MINUTE): INTERVAL literals can't hold expressions — use
            # make_interval with the count in the matching unit slot
            iv = re.match(r"^INTERVAL\s+(.+?)\s+(\w+)$", _collapse_ws(args[1]), re.I)
            if iv:
                slot = {"YEAR": 0, "MONTH": 1, "WEEK": 2, "DAY": 3, "HOUR": 4, "MINUTE": 5, "SECOND": 6}.get(
                    iv.group(2).upper()
                )
                if slot is not None:
                    mk = ["0"] * 7
                    mk[slot] = f"({iv.group(1)})"
                    return f"({args[0]} + make_interval({', '.join(mk)}))"
        return None  # unknown shape: keep as-is

    def ts_diff(args):
        return f"timestampdiff({args[2]}, {args[1]}, {args[0]})" if len(args) == 3 else None

    def ts_trunc(args):
        return f"date_trunc('{args[1]}', {args[0]})" if len(args) == 2 else None

    def dt_trunc(args):
        # BQ DATE_TRUNC/DATETIME_TRUNC take (expr, part) — flipped vs
        # Spark. Only flip when the 2nd arg is a bare unit keyword, so
        # already-Spark-ordered date_trunc('unit', x) passes through.
        if len(args) == 2 and args[1].upper() in _DT_UNITS:
            return f"date_trunc('{args[1]}', {args[0]})"
        return None

    def parse_ts(args):
        if len(args) == 2 and args[0].startswith("'") and args[0].endswith("'"):
            return f"to_timestamp({args[1]}, '{_bq_fmt_to_java(args[0][1:-1])}')"
        return None

    def fmt_date(args):
        if len(args) == 2 and args[0].startswith("'") and args[0].endswith("'"):
            return f"date_format({args[1]}, '{_bq_fmt_to_java(args[0][1:-1])}')"
        return None

    def sha256(args):
        # BQ SHA256 returns BYTES; sha2 returns hex — unhex restores bytes
        return f"unhex(sha2({args[0]}, 256))" if len(args) == 1 else None

    def bq_div(args):
        return f"({args[0]} div {args[1]})" if len(args) == 2 else None

    def date_diff(args):
        # BQ DATE_DIFF(a, b, part) counts PART BOUNDARIES crossed between b
        # and a — not elapsed whole units (Spark timestampdiff). Calendar
        # arithmetic reproduces the boundary count exactly for these parts.
        if len(args) != 3:
            return None
        a, b, unit = args[0], args[1], args[2].upper()
        if unit == "DAY":
            return f"datediff({a}, {b})"
        if unit == "MONTH":
            return f"((year({a}) - year({b})) * 12 + (month({a}) - month({b})))"
        if unit == "QUARTER":
            return f"((year({a}) - year({b})) * 4 + (quarter({a}) - quarter({b})))"
        if unit == "YEAR":
            return f"(year({a}) - year({b}))"
        return f"timestampdiff({unit}, {b}, {a})"

    def generate_array(args):
        # BQ GENERATE_ARRAY(a, b) is EMPTY when b < a; Spark sequence(a, b)
        # infers a descending step instead. Guard with a zero-length slice.
        if len(args) == 2:
            a, b = args
            return f"slice(sequence(({a}), greatest(({a}), ({b}))), 1, greatest(({b}) - ({a}) + 1, 0))"
        if len(args) == 3:
            return f"sequence({args[0]}, {args[1]}, {args[2]})"
        return None

    def trim2(args):
        # BQ TRIM(value, charset) strips any char in the set from both ends
        return f"btrim({args[0]}, {args[1]})" if len(args) == 2 else None

    def json_extract_array(args):
        # array of raw JSON texts; Spark's from_json(array<string>) yields
        # each element's raw text, matching BQ's ARRAY<JSON-string> contract
        if len(args) == 1:
            return f"from_json({args[0]}, 'array<string>')"
        if len(args) == 2:
            return f"from_json(get_json_object({args[0]}, {args[1]}), 'array<string>')"
        return None

    sql = _rewrite_call(sql, "ARRAY", _array_subquery)
    sql = _rewrite_call(sql, "ARRAY_AGG", _array_agg)
    sql = _rewrite_call(sql, "JSON_EXTRACT_ARRAY", json_extract_array)
    sql = _rewrite_call(sql, "TRIM", trim2)
    sql = _rewrite_call(sql, "DATE_DIFF", date_diff)
    sql = _rewrite_call(sql, "DATETIME_DIFF", date_diff)
    sql = _rewrite_call(sql, "GENERATE_ARRAY", generate_array)
    sql = _rewrite_call(sql, "TIMESTAMP_ADD", ts_add)
    sql = _rewrite_call(sql, "TIMESTAMP_DIFF", ts_diff)
    sql = _rewrite_call(sql, "TIMESTAMP_TRUNC", ts_trunc)
    sql = _rewrite_call(sql, "DATETIME_TRUNC", dt_trunc)
    sql = _rewrite_call(sql, "DATE_TRUNC", dt_trunc)
    sql = _rewrite_call(sql, "PARSE_TIMESTAMP", parse_ts)
    sql = _rewrite_call(sql, "PARSE_DATETIME", parse_ts)
    sql = _rewrite_call(sql, "FORMAT_TIMESTAMP", fmt_date)
    sql = _rewrite_call(sql, "FORMAT_DATE", fmt_date)
    sql = _rewrite_call(sql, "SHA256", sha256)
    return _rewrite_call(sql, "DIV", bq_div)


def translate_bq_sql(sql: str) -> str:
    """Translate the documented BQ function families to Spark SQL. Covers
    the constructs appearing in the reference corpus (SURVEY §2.4); not a
    general-purpose transpiler. Timestamp-family calls are parsed with
    balanced parens, so comma-bearing nested arguments translate
    correctly; the remaining rules are name-level renames. Raw strings
    normalize first (so later regexes see plain literals); BQ's tolerated
    trailing commas (``SELECT a, FROM t``) strip last."""
    out = _normalize_raw_strings(sql)
    out = _rewrite_safe_offset(out)
    for pat, repl in _RULES:
        out = pat.sub(repl, out)
    out = _apply_timestamp_rules(out)
    out = _TRAILING_COMMA_FROM.sub(r"\1\2", out)
    return _TRAILING_COMMA_PAREN.sub(r"\1", out)
