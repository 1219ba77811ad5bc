"""Round-7 (late) training operators: URL canonicalization/dedup,
bloom-prefiltered decontamination, CCNet perplexity bucketing — edge
cases and plan shapes beyond the corpus oracles (t46-t48)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training.urls import canonicalize_url, url_dedup


def _canon_one(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(canonicalize_url("url").alias("c"))
        .collect()[0]["c"]
    )


def test_canonicalize_url_rules(spark):
    cases = {
        # scheme+host lowercase; path case preserved
        "HTTPS://Ex.COM/Path": "https://ex.com/Path",
        # www + default port stripped
        "http://www.ex.com:80/a": "http://ex.com/a",
        "https://ex.com:443/a": "https://ex.com/a",
        # non-default port kept
        "https://ex.com:8443/a": "https://ex.com:8443/a",
        # fragment dropped, trailing slash trimmed, empty path -> /
        "https://ex.com/a/#frag": "https://ex.com/a",
        "https://ex.com#f": "https://ex.com/",
        "https://ex.com": "https://ex.com/",
        # root slash survives
        "https://ex.com/": "https://ex.com/",
        # tracking params dropped, survivors sorted
        "https://ex.com/a?utm_source=x&b=2&a=1&fbclid=z": "https://ex.com/a?a=1&b=2",
        "https://ex.com/a?ref=tw": "https://ex.com/a",
        # a param VALUE containing 'ref' is kept (anchored name match)
        "https://ex.com/a?q=ref": "https://ex.com/a?q=ref",
        # no scheme: treated as authority, still canonicalizes totally
        "WWW.Ex.com/a/": "http://ex.com/a",
    }
    for raw, want in cases.items():
        got = _canon_one(spark, raw)
        assert got == want, f"{raw!r}: got {got!r}, want {want!r}"


def test_url_dedup_one_exchange_and_grouping(spark):
    df = spark.createDataFrame(
        [
            (1, "https://ex.com/a?utm_source=x"),
            (2, "HTTPS://WWW.ex.com/a/"),
            (3, "https://ex.com/b"),
        ],
        "doc_id long, url string",
    )
    out = url_dedup(df).orderBy("canonical_url").collect()
    assert [(r["canonical_url"], r["keep_doc_id"], r["n_dups"]) for r in out] == [
        ("https://ex.com/a", 1, 2),
        ("https://ex.com/b", 3, 1),
    ]
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    # one hash-agg exchange, partials combined map-side, zero joins
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan, plan
    assert "partial" in plan.lower(), plan
