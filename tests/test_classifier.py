"""In-engine logistic-regression quality filter (training/classifier.py,
t55): learning actually beats the majority base rate, training is
partitioning-independent, and the smooth scorer's decisions track the
rule gate it distills."""

from __future__ import annotations

import os

from stellar_etl_airflow_spark.training.classifier import (
    distill_logit_gate,
    fit_weights,
    logit_features,
)

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def test_learning_beats_base_rate(spark):
    out = distill_logit_gate(_docs(spark)).cache()
    n = out.count()
    agree = out.filter("label = keep").count()
    pos = out.filter("label").count()
    base = max(pos, n - pos) / n
    assert agree / n > base + 0.02, (
        f"accuracy {agree / n:.3f} vs base rate {base:.3f} — no learning"
    )
    out.unpersist()


def test_weights_partitioning_independent(spark):
    feats = logit_features(_docs(spark))
    w1 = fit_weights(feats, n_iter=5)
    w2 = fit_weights(feats.repartition(7), n_iter=5)
    assert w1 == w2, "decimal-exact gradient sums must kill partition order"
    assert any(abs(x) > 1e-6 for x in w1)  # actually moved off zero


def test_score_is_monotone_in_rule_margin(spark):
    """Docs the rule accepts score higher on average than rejected ones
    — the distilled boundary points the right way."""
    from pyspark.sql import functions as F

    out = distill_logit_gate(_docs(spark))
    m = out.groupBy("label").agg(F.avg("score").alias("s")).collect()
    by = {r["label"]: r["s"] for r in m}
    assert by[True] > by[False] + 0.05
