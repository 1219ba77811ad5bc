"""Distributed BPE merge learning vs a pure-Python reimplementation of
Sennrich et al. 2016 Algorithm 1 (the in-repo oracle for an op whose
iterative argmax is not SQL-expressible), plus encode consistency.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training import bpe as B

DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


def _ref_bpe(texts: list[str], k: int, min_pair_count: int = 2):
    """Algorithm 1, word-type formulation, with the SAME deterministic
    tie-break (count desc, left asc, right asc)."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [B.EOW])] += 1
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        new_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = B.bpe_learn(df, 12)
    want = _ref_bpe([t for _, t in DOCS], 12)
    assert got == want
    # sanity: the classic corpus learns 'est'+EOW and 'low' family merges
    merged = {a + b for a, b, _ in got}
    assert any(m.startswith("est") for m in merged)
    assert "low" in merged or "lo" in merged


def test_bpe_learn_stops_below_min_count(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once -> nothing reaches min_pair_count=2
    assert B.bpe_learn(df, 5) == []


def test_bpe_merges_df_and_encode_roundtrip(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    mdf = B.bpe_merges_df(df, 8)
    rows = mdf.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))

    merges = B.bpe_learn(df, 8)
    enc = B.bpe_encode(df, merges)
    out = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    # decoding invariant: concatenating tokens and stripping EOW
    # reproduces the normalized text of every doc
    for doc_id, text in DOCS:
        joined = "".join(out[doc_id]).replace(B.EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
    # a word fully covered by merges encodes to few tokens
    assert len([t for t in out[0] if t]) < 5 * 4  # "low"x5 far under char count


def test_bpe_greedy_overlap_rule(spark):
    """'aaa' under merge (a,a): greedy left-to-right gives (aa, a) — the
    fold must not re-merge across its own output."""
    df = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id long, text string")
    merges = B.bpe_learn(df, 1)
    assert merges and (merges[0][0], merges[0][1]) == ("a", "a")
    enc = {r["doc_id"]: r["bpe_tokens"] for r in B.bpe_encode(df, merges).collect()}
    assert enc[0] == ["aa", "a", B.EOW] * 3
