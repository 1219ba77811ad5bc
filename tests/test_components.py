"""Connected-components / dedup-decision operator on hand-built graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.training.components import connected_components, dedup_decisions


def test_components_chain_cycle_and_isolates(spark):
    # chain 1-2-3, cycle 10-11-12-10, isolate 99
    vertices = spark.createDataFrame([(v,) for v in [1, 2, 3, 10, 11, 12, 99]], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["component"] for r in connected_components(vertices, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_components_long_path_converges(spark):
    # path 0-1-2-...-12: worst-case diameter for label propagation
    n = 13
    vertices = spark.createDataFrame([(v,) for v in range(n)], "doc_id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    out = connected_components(vertices, edges)
    assert out.filter(F.col("component") != 0).count() == 0

    # the distributed loop (forced via driver_max_edges=0) must agree with
    # the driver union-find fast path, and still bound its rounds
    dist = connected_components(vertices, edges, driver_max_edges=0)
    assert dist.filter(F.col("component") != 0).count() == 0

    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(vertices, edges, max_iter=1, driver_max_edges=0)


def test_dedup_decisions_representatives(spark):
    vertices = spark.createDataFrame([(v,) for v in [5, 6, 7]], "doc_id long")
    edges = spark.createDataFrame([(6, 7)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["component"], r["is_representative"]) for r in dedup_decisions(vertices, edges).collect()}
    assert rows == {5: (5, True), 6: (6, True), 7: (6, False)}


def test_kmeans_refinement_improves_cosine(spark):
    from stellar_etl_airflow_spark.training.similarity import ivf_topk, kmeans_ivf_assign
    from .conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    seed = kmeans_ivf_assign(emb, iters=0)  # assignment against raw seeds
    refined = kmeans_ivf_assign(emb, iters=1)
    mean0 = seed.agg(F.avg("cosine")).collect()[0][0]
    mean1 = refined.agg(F.avg("cosine")).collect()[0][0]
    # Lloyd: each round weakly improves the assignment objective
    assert mean1 >= mean0 - 1e-9
    assert refined.count() == emb.count()


def test_banded_simhash_pairs_equal_allpairs(spark):
    from stellar_etl_airflow_spark.queries.base import tables
    from stellar_etl_airflow_spark.training import dedup as D

    from .conftest import SF_SMOKE

    (docs,) = tables(spark, SF_SMOKE, "documents")
    ap = {tuple(r) for r in D.simhash_neardup_pairs(docs, max_hamming=8).collect()}
    bd = {tuple(r) for r in D.simhash_neardup_pairs_banded(docs, max_hamming=8).collect()}
    assert ap == bd and len(ap) > 0
