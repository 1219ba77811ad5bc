"""Round-6 training operators: SemDeDup semantic dedup and DSIR
importance weights — edge cases and plan-shape checks beyond the corpus
oracles (t37/t38)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training.similarity import semantic_dedup
from stellar_etl_airflow_spark.training.text import importance_logratio


def test_semantic_dedup_groups_and_representatives(spark):
    # two exact-duplicate groups + one singleton; duplicates share every
    # LSH bucket by construction (identical vectors)
    dim = 8
    v1 = [1.0] + [0.0] * (dim - 1)
    v2 = [0.0, 1.0] + [0.0] * (dim - 2)
    v3 = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    rows = [(1, v1), (2, v1), (5, v2), (9, v2), (7, v3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["component"], r["is_representative"])
           for r in semantic_dedup(emb, threshold=0.99, n_planes=6, dim=dim).collect()}
    assert out[1] == (1, True) and out[2] == (1, False)
    assert out[5] == (5, True) and out[9] == (5, False)
    assert out[7] == (7, True)
    # dedup keeps exactly one representative per group
    assert sum(1 for _, rep in out.values() if rep) == 3


def test_importance_logratio_direction_and_smoothing(spark):
    # target docs speak "alpha", raw corpus mostly "beta": an alpha doc
    # must score positive, a beta doc negative; smoothing keeps unseen
    # words finite
    rows = [
        (1, "alpha alpha alpha", True),
        (2, "alpha alpha", True),
        (3, "beta beta beta", False),
        (4, "beta beta beta beta", False),
        (5, "alpha beta", False),
        (6, "gamma", False),  # out-of-target-vocab word
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r["doc_id"]: r["avg_logratio"]
           for r in importance_logratio(df, is_target=F.col("is_t")).collect()}
    assert out[1] > 0 > out[3]
    assert out[1] == out[2]  # same bag-of-words distribution -> same score
    assert out[6] is not None  # smoothed: defined even for target-unseen words
    # doc 5 mixes both: strictly between the pure docs
    assert out[3] < out[5] < out[1]


def test_importance_logratio_single_residual_shuffle(spark):
    """Plan contract: the term-level model shuffle runs ONCE, inside the
    eagerly-materialized vocab (visible as a Scan ExistingRDD), so the
    scoring plan's only hash exchange is the per-doc aggregate; vocab and
    totals ride broadcast exchanges. More hash exchanges would mean the
    fold or the vocab re-shuffles per consumer (the regression this
    contract pins — three exchanges before the r6 fix)."""
    rows = [(i, f"w{i % 7} w{(i + 1) % 5} common", i % 3 == 0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    plan = (
        importance_logratio(df, is_target=F.col("is_t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Scan ExistingRDD" in plan, plan  # materialized fold + vocab
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan, plan
