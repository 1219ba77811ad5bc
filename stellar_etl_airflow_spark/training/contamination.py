"""Train/eval contamination detection: which training documents share
n-grams with a held-out evaluation set.

The standard decontamination step in LLM data prep (e.g. GPT-3 appendix C,
PaLM §6, the Dolma/RedPajama pipelines): before training, every document
is checked for n-gram overlap against the benchmark suites, and
overlapping documents are dropped or masked. The expensive way is a
doc × eval cross-check; the scalable way — used here — is an inverted
index on the n-grams themselves, joined eval-side-broadcast because the
benchmark set is always tiny next to a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_word_ngrams


def contamination_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 97,
    n: int = 3,
) -> DataFrame:
    """Per-training-document contamination counts against the eval split.

    The eval split is defined deterministically as ``doc_id % eval_mod ==
    0`` (standing in for "the benchmark suite" — in production the eval
    side is its own small table). Output: one row per CONTAMINATED
    training doc with the number of distinct shared n-grams and the number
    of distinct eval docs hit; clean docs don't appear (the report is the
    drop/mask list).

    Scale shape: n-gram postings are exploded once; the eval side
    (|benchmarks| ~ MBs) is broadcast, so the corpus-side postings are
    never shuffled — the join is map-side against the eval hash table.
    One aggregation shuffle on the (small) hit set.
    """
    # materialized once: the eval and train branches both consume this
    # fold, and Catalyst's projection collapse would re-run the shingling
    # in each branch (single-fold discipline, training/dedup.py)
    grams = (
        with_word_ngrams(df, text_col, n)
        .select(F.col(id_col).alias(id_col), F.explode("grams").alias("gram"))
        .localCheckpoint(eager=True)
    )
    is_eval = (F.col(id_col) % eval_mod) == 0
    eval_grams = grams.filter(is_eval).select(F.col(id_col).alias("eval_id"), "gram")
    train_grams = grams.filter(~is_eval)
    hits = train_grams.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.countDistinct("gram").alias("n_shared_grams"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )

def bloom_decontaminate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 97,
    n: int = 3,
    m_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """Per-training-document contamination decision with a Bloom-filter
    prefilter — the 100 TB form of `contamination_report`.

    `contamination_report` broadcasts the full eval n-gram table; for a
    real benchmark suite that broadcast is 100s of MB and every corpus
    gram probes it. Here the eval grams are folded into a FIXED-SIZE
    Bloom filter (``m_bits`` bits, ``k`` JVM-side xxhash64 probes)
    evaluated as a whole-stage-codegen filter over the corpus postings:
    non-matching grams (the overwhelming majority) die map-side without
    touching any join. Only the surviving candidates — exact hits plus
    the bloom's false positives — flow into the exact confirm join, so
    the RESULT is exactly `contamination_report`'s (a Bloom filter has
    no false negatives; false positives are removed by the confirm).

    Output: one row per TRAINING document (clean docs included):
    ``doc_id, n_shared_grams, n_eval_docs, contaminated``.

    Scale accounting: the bloom build collects DISTINCT bit positions —
    bounded by ``m_bits`` (= 16 KiB of bitset at the default) no matter
    how large the eval set is; the bitset ships in the plan as an
    array<long> literal (``m_bits/64`` words). At a production 1e8-gram
    benchmark suite, size m_bits ~ 10 bits/gram for ~1% fp and the
    bitset is ~125 MB — at that point broadcast it as a joined 1-row
    frame instead of a literal; the probe expression is unchanged.
    """
    from ..operators.bloomjoin import bloom_prefilter

    grams = (
        with_word_ngrams(df, text_col, n)
        .select(F.col(id_col), F.explode("grams").alias("gram"))
        .localCheckpoint(eager=True)
    )
    is_eval = (F.col(id_col) % eval_mod) == 0
    eval_grams = grams.filter(is_eval).select(F.col(id_col).alias("eval_id"), "gram")

    # map-side candidate filter: the shared bloom-join operator
    # (operators/bloomjoin.py) — bitset build bounded by m_bits, k
    # xxhash64 probes in whole-stage codegen over the corpus postings
    candidates = bloom_prefilter(
        grams.filter(~is_eval), "gram", eval_grams, m_bits=m_bits, k=k
    )

    # --- exact confirm + per-doc rollup (identical to contamination_report)
    hits = candidates.join(F.broadcast(eval_grams), "gram").groupBy(id_col).agg(
        F.countDistinct("gram").alias("n_shared_grams"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )
    train_docs = df.filter(~is_eval).select(id_col)
    return train_docs.join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        F.coalesce("n_eval_docs", F.lit(0)).alias("n_eval_docs"),
        F.col("n_shared_grams").isNotNull().alias("contaminated"),
    )
