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


def test_bloom_decontaminate_matches_exact_even_with_tiny_bloom(spark):
    """With m_bits=64 nearly every probe collides (false positives
    everywhere) — the confirm join must still produce exactly the
    no-bloom report, proving fps only cost work, never correctness."""
    from stellar_etl_airflow_spark.training.contamination import (
        bloom_decontaminate,
        contamination_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tiny = bloom_decontaminate(docs, m_bits=64, k=2)
    got = {
        r["doc_id"]: (r["n_shared_grams"], r["n_eval_docs"], r["contaminated"])
        for r in tiny.collect()
    }
    exact = {
        r["doc_id"]: (r["n_shared_grams"], r["n_eval_docs"])
        for r in contamination_report(docs).collect()
    }
    assert sum(1 for v in got.values() if v[2]) == len(exact)
    for d, (a, b) in exact.items():
        assert got[d] == (a, b, True)
    # clean docs appear with zero counts
    assert all(v == (0, 0, False) for d, v in got.items() if d not in exact)


def test_bloom_probe_is_mapside_prefilter(spark):
    """The bloom probe must evaluate map-side BEFORE the confirm join:
    the bitset rides a 1-row broadcast cross join (a literal array would
    cost a 12k-node expression tree — measured 4x slower) and the probe
    predicate is that join's condition, so grams die streaming-side
    without shuffling or probing the confirm hash table."""
    from stellar_etl_airflow_spark.training.contamination import bloom_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bloom_decontaminate(docs)._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    probe = [i for i, ln in enumerate(lines)
             if "BroadcastNestedLoopJoin" in ln and "Cross" in ln and "xxhash64" in ln]
    confirm = [i for i, ln in enumerate(lines) if "BroadcastHashJoin" in ln]
    assert probe and confirm, plan
    # the probe is BELOW the confirm join in the tree (runs first)
    assert probe[0] > confirm[0], plan
    # and no exchange between probe and confirm (map-side chain)
    assert not any("Exchange" in lines[i] for i in range(confirm[0], probe[0])), plan


def test_ccnet_buckets_terciles_per_lang(spark):
    """Within each language the head/middle/tail split is ~equal thirds
    and monotone in avg_neg_logprob (head = lowest perplexity)."""
    from stellar_etl_airflow_spark.training.text import ccnet_perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ccnet_perplexity_buckets(docs).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r["avg_neg_logprob"], r["doc_id"]))
        seq = [order[r["ppl_bucket"]] for r in rows]
        assert seq == sorted(seq), f"{lang}: buckets not monotone in score"
        n = len(rows)
        if n >= 3:
            for b in ("head", "middle", "tail"):
                cnt = sum(1 for r in rows if r["ppl_bucket"] == b)
                assert abs(cnt - n / 3) <= 1, (lang, b, cnt, n)


def test_bloom_semi_join_exact_and_mapside(spark):
    """bloom_semi_join == exact leftsemi join, with the probe filter in
    the plan before the confirm join."""
    from stellar_etl_airflow_spark.operators.bloomjoin import bloom_semi_join

    large = spark.range(0, 5000).select(
        F.concat(F.lit("k"), (F.col("id") % 500).cast("string")).alias("key"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("k3",), ("k77",), ("k499",), ("missing",)], "key string"
    )
    got = bloom_semi_join(large, small, "key")
    exact = large.join(small.select("key").distinct(), "key", "leftsemi")
    assert sorted(r["v"] for r in got.collect()) == sorted(
        r["v"] for r in exact.collect()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "LeftSemi" in plan, plan


def test_bloom_prefilter_superset_never_drops(spark):
    """Even a saturated 64-bit bloom never drops a true match."""
    from stellar_etl_airflow_spark.operators.bloomjoin import bloom_prefilter

    large = spark.range(0, 2000).select(F.col("id").cast("string").alias("key"))
    small = spark.range(0, 2000, 7).select(F.col("id").cast("string").alias("key"))
    cand = set(r["key"] for r in bloom_prefilter(large, "key", small, m_bits=64, k=2).collect())
    truth = set(str(i) for i in range(0, 2000, 7))
    assert truth <= cand


def test_paragraph_dedup_flags_injected_duplicates(spark):
    """Two docs sharing an identical 12-word window are both flagged;
    a unique doc reports zero duplicate fraction."""
    from stellar_etl_airflow_spark.training.dedup import paragraph_dedup_stats

    shared = " ".join(f"tok{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(12))),
            (2, shared + " " + " ".join(f"b{i}" for i in range(12))),
            (3, " ".join(f"c{i}" for i in range(24))),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup_stats(df).collect()}
    assert got[1]["n_paragraphs"] == 2 and got[1]["n_dup_paragraphs"] == 1
    assert got[1]["dup_token_frac"] == 0.5
    assert got[2]["n_dup_paragraphs"] == 1
    assert got[3]["n_dup_paragraphs"] == 0 and got[3]["dup_token_frac"] == 0.0


def test_bloom_semi_join_survives_type_drift(spark):
    """int build side probed by a bigint column (routine schema drift)
    must not produce false negatives — values hash as strings on both
    sides (review r7)."""
    from stellar_etl_airflow_spark.operators.bloomjoin import bloom_semi_join

    large = spark.range(0, 1000).select(F.col("id").cast("long").alias("key"))
    small = spark.createDataFrame([(7,), (500,)], "key int")
    got = sorted(r["key"] for r in bloom_semi_join(large, small.selectExpr("cast(key as long) key"), "key").collect())
    assert got == [7, 500]
    # and with the raw INT build side against the BIGINT probe side
    got2 = sorted(r["key"] for r in bloom_semi_join(large, small, "key").collect())
    assert got2 == [7, 500]
