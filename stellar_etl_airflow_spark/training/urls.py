"""URL canonicalization + URL-level dedup — the first dedup stage of a
web-crawl training pipeline (RefinedWeb §3.1, CCNet, Dolma all dedup by
canonical URL before any content-based pass: it removes the bulk of
exact refetch duplicates for the cost of a string fold + one hash
shuffle).

Canonicalization is a pure expression fold (zero shuffle, whole-stage
codegen): scheme/host lowercased, ``www.`` and explicit default ports
stripped, fragment dropped, tracking query parameters (utm_*, fbclid,
gclid, ref, ...) removed, surviving parameters sorted, trailing slash
trimmed. Dedup is then ONE hash aggregation on the canonical string —
at 100 TB the cheapest shuffle in the pipeline (short-string key,
map-side partial combine, and the skew ceiling is one URL's refetch
multiplicity, not a language or a domain).

The string surgery uses locate/substr arithmetic rather than regex
capture so the DuckDB oracle can mirror it operation-for-operation
(position()/substr()), keeping cross-engine equality exact.

Reference scope note: stellar/stellar-etl-airflow has no crawl layer —
this module is part of the beyond-reference training-data surface the
brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dropped query parameters: click/campaign trackers that never change the
# resource identity (Google Analytics utm_*, Facebook fbclid, Google Ads
# gclid, Microsoft msclkid, generic ref/source affiliate tags). Anchored
# match against "name=..." — both Spark rlike and DuckDB regexp_matches
# use search semantics, so the ^ anchor makes them identical.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|ref_src|source)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL as a single JVM expression tree.

    Each step is a documented HTTP equivalence: scheme+host lowercase
    (RFC 3986 §6.2.2.1), fragment dropped (never sent to the server),
    ``www.`` and explicit default ports (``:80``/``:443``) stripped,
    tracking parameters removed, surviving query parameters sorted
    (parameter order is not semantic), one trailing slash trimmed from a
    non-root path, empty path normalized to ``/``. The fold is total —
    malformed inputs flow through without raising (a URL with no ``://``
    canonicalizes its whole body as the authority, which still dedups
    consistently).
    """
    u = F.col(url) if isinstance(url, str) else url
    h = F.locate("#", u)
    u0 = F.when(h > 0, u.substr(F.lit(1), h - 1)).otherwise(u)  # strip fragment
    q = F.locate("?", u0)
    head = F.when(q > 0, u0.substr(F.lit(1), q - 1)).otherwise(u0)
    qry = F.when(q > 0, u0.substr(q + 1, F.length(u0))).otherwise(F.lit(""))

    s = F.locate("://", head)
    scheme = F.when(s > 0, F.lower(head.substr(F.lit(1), s - 1))).otherwise(F.lit("http"))
    rest = F.when(s > 0, head.substr(s + 3, F.length(head))).otherwise(head)

    slash = F.locate("/", rest)
    auth = F.when(slash > 0, rest.substr(F.lit(1), slash - 1)).otherwise(rest)
    path = F.when(slash > 0, rest.substr(slash, F.length(rest))).otherwise(F.lit("/"))

    host = F.regexp_replace(
        F.regexp_replace(F.lower(auth), r"^www\.", ""), r":(80|443)$", ""
    )
    # trim ONE trailing slash unless the path is just "/" (path stays
    # case-sensitive — only scheme and host are case-insensitive)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)

    params = F.filter(
        F.split(qry, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Group rows by canonical URL, keeping the lowest id as the survivor.

    One shuffle (hash agg on the canonical string, min/count combine
    map-side). Output: ``canonical_url``, ``keep_<id>`` (the survivor),
    ``n_dups`` (group size — 1 means the URL is unique).
    """
    return (
        df.select(
            canonicalize_url(url_col).alias("canonical_url"), F.col(id_col)
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
