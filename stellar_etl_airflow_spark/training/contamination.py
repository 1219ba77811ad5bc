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
