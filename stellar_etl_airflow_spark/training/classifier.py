"""In-engine trainable quality filter: full-batch logistic regression
distilling a hand-written rule gate into a smooth scorer — the
engine-native counterpart of the fasttext-style quality classifiers
production pipelines train over hand features (CCNet / GPT-3's
WebText-likeness filter; Brown et al. 2020 §A; Wenzek et al. 2020).
The label is the repo's own t10 rule gate (length/stopword/punct/digit
composite >= 0.5); the model sees only three of its ingredients, so
the distillation is a real fit, not an identity.

Spark-first shape: each gradient step is ONE map-side-combined
aggregate over the feature table (four decimal-exact sums + a count),
and the weight update is computed in-plan on that 1-row aggregate —
the driver only ferries four rounded doubles between rounds, exactly
PageRank's per-iteration traffic. Features stay inside whole-stage
codegen; no Python UDFs anywhere.

Cross-engine determinism (the t44 discipline): the pre-activation is
rounded before the sigmoid and the sigmoid output is rounded again
(kills last-ulp exp() divergence between JVM and C libm), per-row
gradient addends are rounded then summed as DECIMAL(38,12)
(associative, partitioning-independent), and each weight is rounded to
9 decimals — so a fixed step count unrolls to EXACT SQL and the DuckDB
oracle replays training round by round. Sigmoid/addend granularity is
6 decimals, coarser than t44's 12: rounding a DOUBLE at precision p
can flip between engines when the scaled value sits within one ulp of
a .5 edge (~ulp(x*10^p) odds) — at p=9 that is ~1e-7 per value,
observed on 2/5000 docs at sf0.01; at p=6 it is ~1e-10, negligible
across the whole training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import quality_score

LR = 12.0
N_ITER = 16


def logit_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, y, f1, f2, f3): label y = the t10 rule gate — taken
    DIRECTLY from :func:`text.quality_score`'s ``keep`` column so the
    distillation target can never drift from the real gate (review r8);
    features = its stopword/punct ratios + capped length, three of the
    gate's four ingredients (the digit term is withheld, so the fit is
    a genuine approximation)."""
    q = quality_score(df, text_col=text_col, id_col=id_col)
    return q.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col("keep"), 1.0).otherwise(0.0).alias("y"),
        F.col("stopword_ratio").alias("f1"),
        F.col("punct_ratio").alias("f2"),
        F.least(F.col("n_words") / 100.0, F.lit(1.0)).alias("f3"),
    )


def _prepare(feats: DataFrame) -> DataFrame:
    """Checkpoint + right-size the per-step task count: sequential
    32-task jobs over a few thousand rows are pure scheduler overhead,
    and the decimal-exact sums make the result partition-layout-
    invariant (pinned by test_weights_partitioning_independent), so
    coalescing small feature tables is free. At 100 TB rows/200k keeps
    every step a parallel map-side-combined aggregate."""
    feats = feats.localCheckpoint(eager=True)
    n_rows = feats.count()
    cur = feats.rdd.getNumPartitions()
    parts = max(1, min(cur, n_rows // 200_000 + 1))
    if parts < cur:
        feats = feats.coalesce(parts).localCheckpoint(eager=True)
    return feats


def fit_weights(
    feats: DataFrame, n_iter: int = N_ITER, lr: float = LR, prepared: bool = False
) -> list[float]:
    """``n_iter`` full-batch gradient steps from w=0. One aggregate job
    per step; every arithmetic step mirrors the unrolled SQL oracle."""
    if not prepared:
        feats = _prepare(feats)
    w = [0.0, 0.0, 0.0, 0.0]
    fcols = ["1.0", "f1", "f2", "f3"]
    for _ in range(n_iter):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("f1") + F.lit(w[2]) * F.col("f2") + F.lit(w[3]) * F.col("f3")
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, 6))), 6)
        resid = F.col("y") - p
        aggs = [F.count(F.lit(1)).cast("double").alias("n")] + [
            F.sum(F.round(F.expr(fc) * resid, 6).cast("decimal(38,12)"))
            .cast("double")
            .alias(f"g{j}")
            for j, fc in enumerate(fcols)
        ]
        upd = feats.agg(*aggs).select(
            *[
                F.round(F.lit(w[j]) + lr * F.col(f"g{j}") / F.col("n"), 9).alias(f"w{j}")
                for j in range(4)
            ]
        )
        row = upd.collect()[0]
        w = [float(row[f"w{j}"]) for j in range(4)]
    return w


def distill_logit_gate(
    df: DataFrame,
    n_iter: int = N_ITER,
    lr: float = LR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the filter and score every document: (doc_id, label,
    score, keep). ``keep`` is the smooth scorer's >= 0.5 decision — the
    distilled replacement for the hard rule gate (~87% agreement at every
    fixture scale vs an ~82% majority base rate; the gap is the withheld digit
    feature plus the smooth boundary)."""
    # one checkpointed feature table serves BOTH training and the final
    # scoring pass (review r8: scoring over the raw lineage re-ran the
    # corpus-wide feature extraction a second time)
    feats = _prepare(logit_features(df, text_col, id_col))
    w = fit_weights(feats, n_iter, lr, prepared=True)
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("f1") + F.lit(w[2]) * F.col("f2") + F.lit(w[3]) * F.col("f3")
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, 6))), 6)
    return feats.select(
        "doc_id",
        (F.col("y") == 1.0).alias("label"),
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    )
