"""Product quantization (training/similarity.py pq_*): exactness when
the codebook saturates, recall against exact search otherwise, and the
corpus-never-shuffles / lookups-only plan contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training import similarity as SIM


def _vectors(spark, n=64, dim=8, seed_mod=997):
    # deterministic pseudo-random doubles in [-1, 1)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}),"
            f" i -> cast(pmod(id * 31 + i * 17, {seed_mod}) as double) / {seed_mod} * 2 - 1)"
        ).alias("embedding"),
    )


def test_pq_exact_when_codebook_saturates(spark):
    """With every corpus vector a seed and zero refinement drift (each
    subvector is its own centroid), ADC == the exact dot product."""
    corpus = _vectors(spark, n=12, dim=8)
    cb = SIM.pq_train(corpus, m=2, n_iter=1, centroid_pred=F.lit(True))
    codes = SIM.pq_encode(corpus, cb, m=2)
    queries = corpus.filter(F.col("vec_id") < 3)
    got = SIM.pq_topk(codes, queries, cb, m=2, k=3)
    # every ADC dot equals the exact dot for its (query, vec) pair
    # (note: self is NOT necessarily rank-1 — unlike cosine, dot(q, x)
    # can exceed dot(q, q))
    ex = {
        (r["query_id"], r["vec_id"]): r
        for r in corpus.alias("a").crossJoin(corpus.alias("b")).select(
            F.col("a.vec_id").alias("query_id"), F.col("b.vec_id").alias("vec_id"),
            F.round(F.expr(SIM.DOT.format(a="a.embedding", b="b.embedding")), 6).alias("dot"),
        ).collect()
    }
    for r in got.collect():
        assert r["adc_dot"] == pytest.approx(ex[(r["query_id"], r["vec_id"])]["dot"], abs=1e-6)


def test_pq_recall_against_exact(spark):
    """Lossy regime: 16 seeds x 2 rounds; top-1 by ADC must hit the exact
    top-3 for most queries (coarse-but-sane quantization bound)."""
    corpus = _vectors(spark, n=80, dim=8)
    cb = SIM.pq_train(corpus, m=4, n_iter=2)
    codes = SIM.pq_encode(corpus, cb, m=4)
    queries = corpus.filter(F.col("vec_id") % 20 == 0)
    got = SIM.pq_topk(codes, queries, cb, m=4, k=1).collect()
    # exact DOT ranking (ADC approximates the dot, not the cosine)
    exact = (
        queries.alias("a").crossJoin(corpus.alias("b"))
        .select(
            F.col("a.vec_id").alias("q"), F.col("b.vec_id").alias("v"),
            F.expr(SIM.DOT.format(a="a.embedding", b="b.embedding")).alias("d"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q").orderBy(F.col("d").desc())
    ex_top = {}
    for r in exact.withColumn("r", F.row_number().over(w)).filter("r <= 3").collect():
        ex_top.setdefault(r["q"], set()).add(r["v"])
    hits = sum(1 for r in got if r["vec_id"] in ex_top.get(r["query_id"], set()))
    assert hits >= len(got) * 0.5, (hits, len(got))


def test_pq_codes_compact_and_deterministic(spark):
    corpus = _vectors(spark, n=40, dim=8)
    cb = SIM.pq_train(corpus, m=4, n_iter=1)
    a = {r["vec_id"]: r["codes"] for r in SIM.pq_encode(corpus, cb, m=4).collect()}
    b = {r["vec_id"]: r["codes"] for r in
         SIM.pq_encode(corpus.repartition(7), cb, m=4).collect()}
    assert a == b  # partitioning-independent
    assert all(len(c) == 4 for c in a.values())
    k_sub = cb.groupBy("block").count().agg(F.max("count")).collect()[0][0]
    assert all(0 <= x < k_sub for c in a.values() for x in c)


def test_pq_scoring_plan_is_lookup_only(spark):
    """ADC contract: the corpus-side scoring plan contains NO vector
    arithmetic join — just the broadcast query tables and array lookups;
    the only join is the broadcast cross attach."""
    corpus = _vectors(spark, n=40, dim=8)
    cb = SIM.pq_train(corpus, m=4, n_iter=1)
    codes = SIM.pq_encode(corpus, cb, m=4).localCheckpoint(eager=True)
    queries = corpus.filter(F.col("vec_id") < 2)
    plan = SIM.pq_topk(codes, queries, cb, m=4, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    scoring = [ln for ln in plan.splitlines() if "NestedLoopJoin" in ln]
    assert all("Cross" in ln for ln in scoring)  # 1-per-query broadcast attach
