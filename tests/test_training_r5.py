"""Round-5 training ops: contamination report, per-language quality gate,
source vocabulary overlap (training/contamination.py, training/text.py)."""

from __future__ import annotations

from stellar_etl_airflow_spark.training.contamination import contamination_report
from stellar_etl_airflow_spark.training.text import per_lang_quality_filter, source_vocab_overlap


def test_contamination_report_counts(spark):
    # doc 0 is the eval split (0 % 97 == 0); doc 194 too (194 = 2*97).
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # eval: grams include 'alpha beta gamma'
            (194, "zeta eta theta iota"),           # eval: disjoint grams
            (1, "alpha beta gamma something else"), # shares 1 gram with doc 0
            (2, "totally different words here now"),# clean
            (3, "alpha beta gamma delta epsilon"),  # shares 2 grams with doc 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_report(docs).collect()}
    assert set(out) == {1, 3}  # clean docs and eval docs don't appear
    assert out[1]["n_shared_grams"] == 1 and out[1]["n_eval_docs"] == 1
    assert out[3]["n_shared_grams"] == 2 and out[3]["n_eval_docs"] == 1


def test_per_lang_quality_filter_gates_within_language(spark):
    # 4 docs per lang; score is driven by word count (longer = higher until
    # 100 words) — the top half WITHIN each language must be kept, so a
    # short doc in a short-doc language survives while a longer doc in a
    # long-doc language is dropped (global threshold would invert this).
    def doc(i, lang, n_words):
        return (i, " ".join(["the"] * n_words), lang)

    rows = [doc(1, "aa", 80), doc(2, "aa", 60), doc(3, "aa", 40), doc(4, "aa", 20),
            doc(5, "bb", 8), doc(6, "bb", 6), doc(7, "bb", 4), doc(8, "bb", 2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = {r["doc_id"] for r in per_lang_quality_filter(docs, keep_frac=0.5).collect()}
    # percent_rank <= 0.5 keeps ranks 1..ceil(n/2)+... for n=4: pr = 0, 1/3, 2/3, 1
    assert kept == {1, 2, 5, 6}
    # doc 6 (6 'the' words) kept while doc 3 (40 words) dropped: per-lang, not global
    assert 6 in kept and 3 not in kept


def test_source_vocab_overlap_jaccard(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s2"),
            (3, "x y z", "s3"),
            (4, "c b", "s2"),  # same source, no new vocab beyond d,b,c
        ],
        "doc_id long, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): r for r in source_vocab_overlap(docs).collect()}
    # s1={a,b,c}, s2={b,c,d}: shared 2, union 4 -> 0.5 ; s3 disjoint (no row)
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert (r["shared"], r["na"], r["nb"]) == (2, 3, 3)
    assert abs(r["jaccard"] - 0.5) < 1e-12


def test_threshold_gate_matches_window_gate_semantics(spark):
    """t31 (aggregate+broadcast) selects the same 'top half' as a median
    threshold; the approx variant agrees on well-separated scores, and the
    gate join is a broadcast (no corpus shuffle for the gate itself)."""
    from stellar_etl_airflow_spark.training.text import per_lang_quality_filter_threshold

    def doc(i, lang, n_words):
        return (i, " ".join(["the"] * n_words), lang)

    rows = [doc(1, "aa", 80), doc(2, "aa", 60), doc(3, "aa", 40), doc(4, "aa", 20),
            doc(5, "bb", 8), doc(6, "bb", 6), doc(7, "bb", 4), doc(8, "bb", 2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    exact = per_lang_quality_filter_threshold(docs, quantile=0.5)
    kept = {r["doc_id"] for r in exact.collect()}
    assert kept == {1, 2, 5, 6}  # >= median keeps the top half per language
    approx = per_lang_quality_filter_threshold(docs, quantile=0.5, approx=True)
    assert {r["doc_id"] for r in approx.collect()} <= {1, 2, 3, 5, 6, 7}
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_unigram_logprob_scores(spark):
    """Rare-token documents score higher (more surprising) than documents
    made of the corpus's most common token."""
    from stellar_etl_airflow_spark.training.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "the the rare the"), (3, "the the the zz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["avg_neg_logprob"] < out[2]["avg_neg_logprob"] <= out[3]["avg_neg_logprob"]
    import math

    # doc 1 is all 'the' (tf=10 of 12 tokens): avg nlp = -ln(10/12)
    assert abs(out[1]["avg_neg_logprob"] - round(-math.log(10 / 12), 6)) < 1e-9


def test_rebalance_sources_hits_target_proportions(spark):
    from stellar_etl_airflow_spark.training.text import rebalance_sources

    rows = [(i, f"doc {i}", "a" if i < 600 else ("b" if i < 900 else "c")) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = rebalance_sources(docs, {"a": 0.25, "b": 0.25, "c": 0.5}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # c is the binding source (100 docs / 0.5 -> M=200): c keeps everything,
    # a and b hash-gate down to ~50 each (hash gate is approximate)
    assert len(by_src["c"]) == 100
    assert 30 <= len(by_src["a"]) <= 70 and 30 <= len(by_src["b"]) <= 70
    # determinism: same inputs -> same membership
    again = rebalance_sources(docs, {"a": 0.25, "b": 0.25, "c": 0.5}).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # dropped source: not in targets -> absent
    out2 = rebalance_sources(docs, {"a": 1.0}).collect()
    assert {r["source"] for r in out2} == {"a"}


def test_boilerplate_coverage_flags_frequent_grams(spark):
    from stellar_etl_airflow_spark.training.text import boilerplate_coverage

    # 'hello world' appears in 9/10 docs (90% >= 50% threshold -> boilerplate);
    # each doc's tail grams are unique (df=1 < 5 docs). NB: at 10 docs a 7%
    # bar is 0.7 docs, i.e. EVERY gram qualifies — small corpora need a
    # proportionally higher df_pct.
    rows = [(i, f"hello world unique{i} tail{i}") for i in range(9)]
    rows.append((9, "clean text entirely original"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_coverage(docs, n=2, df_pct=50).collect()}
    assert len(out) == 10
    # docs 0-8: grams = {hello world, world uniqueN, uniqueN tailN} -> 1/3 bp
    for i in range(9):
        assert out[i]["n_grams"] == 3 and out[i]["n_bp"] == 1
        assert abs(out[i]["bp_frac"] - 1 / 3) < 1e-12 and out[i]["keep"]
    assert out[9]["n_bp"] == 0 and out[9]["keep"]
    # raise the doc-frequency bar past 90%: nothing is boilerplate any more
    out_hi = boilerplate_coverage(docs, n=2, df_pct=95).collect()
    assert all(r["n_bp"] == 0 for r in out_hi)
    # keep gate: drop docs that are > 30% boilerplate
    kept = {r["doc_id"] for r in boilerplate_coverage(docs, n=2, df_pct=50, keep_max_pct=30).collect() if r["keep"]}
    assert kept == {9}


def test_redact_pii_patterns_and_counts(spark):
    from stellar_etl_airflow_spark.training.text import redact_pii

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk or call (555) 123-4567"),
        (2, "server 192.168.1.254 ssn 123-45-6789"),
        (3, "nothing sensitive here"),
        (4, "intl +1 555.123.4567 and bare 5551234567"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in redact_pii(df).collect()}
    assert "[EMAIL]" in out[1]["text"] and "jane" not in out[1]["text"]
    assert "[PHONE]" in out[1]["text"] and out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["text"] == "server [IPV4] ssn [SSN]"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_ssn"] == 1
    assert out[3]["text"] == "nothing sensitive here"
    assert all(out[3][f"n_{k}"] == 0 for k in ("email", "ipv4", "ssn", "phone"))
    assert out[4]["n_phone"] == 2 and out[4]["text"].count("[PHONE]") == 2
    # layering: the email's digits must never be re-matched by phone
    assert out[1]["text"].count("[EMAIL]") == 1
    # out_col keeps the original when asked
    kept = redact_pii(df, out_col="clean").collect()[0]
    assert "clean" in kept.asDict() and "text" in kept.asDict()
