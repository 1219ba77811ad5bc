"""Regression tests for the round-8 ADVICE findings: insert_unique
crashing on non-orderable (map) columns and ignoring caller tiebreaks,
the column-mapping guard in _merge_versioned_core breaking exactly-once
txn replay on since-mapped tables, pending-clone pin lists stored as
relative paths (cwd-dependent vacuum protection) with protection tied
to the short orphan window, and pq_topk type-gating only the corpus id
column (string query ids failed with an opaque ValueError).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import (
    insert_unique,
    merge_additive_versioned,
)
from stellar_etl_airflow_spark.sinks import snapshots as S


def test_insert_unique_survives_map_columns(spark):
    """ADVICE r8: the in-batch dedup window ordered by EVERY non-key
    column; map columns are not orderable and crashed the plan. They are
    now skipped — ordering uses only orderable columns."""
    tgt = spark.createDataFrame([(1, "a", {"x": 1})], "k long, v string, m map<string,int>")
    batch = spark.createDataFrame(
        [(2, "y", {"b": 2}), (2, "x", {"a": 2}), (1, "dup", {"c": 3})],
        "k long, v string, m map<string,int>",
    )
    out = {r["k"]: r["v"] for r in insert_unique(tgt, batch, ("k",)).collect()}
    assert out == {2: "x"}  # deterministic min over the orderable column


def test_insert_unique_caller_tiebreak(spark):
    """Caller-supplied tiebreak overrides the all-orderable-columns
    default: keep the lowest seq per key, not the lexicographic-min v."""
    tgt = spark.createDataFrame([], "k long, v string, seq long")
    batch = spark.createDataFrame(
        [(2, "zzz", 1), (2, "aaa", 9)], "k long, v string, seq long"
    )
    out = {r["k"]: r["v"] for r in insert_unique(tgt, batch, ("k",), tiebreak=("seq",)).collect()}
    assert out == {2: "zzz"}


def test_txn_replay_is_noop_on_since_mapped_table(spark, tmp_path):
    """ADVICE r8: the renames/drops guard ran BEFORE the txn-ledger
    replay check, so a redelivered batch whose txn_id was already
    recorded raised NotImplementedError on a since-renamed table instead
    of returning the recorded version (exactly-once no-op)."""
    from stellar_etl_airflow_spark.operators.jobs import rename_state_column

    tbl = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, 5)], "k long, n long")
    v1, _ = merge_additive_versioned(
        spark, b1, tbl, keys=("k",), sum_cols=("n",), n_buckets=4, txn_id="batch-1"
    )
    # unbucket (ledger carried) + metadata-only rename
    rename_state_column(spark, tbl, "n", "total")
    # replay of the recorded txn: must return v1 untouched, not raise
    rv, touched = merge_additive_versioned(
        spark, b1, tbl, keys=("k",), sum_cols=("n",), n_buckets=4, txn_id="batch-1"
    )
    assert (rv, touched) == (v1, [])
    # a NEW txn still hits the guard: merging would fork the schema
    b2 = spark.createDataFrame([(2, 7)], "k long, total long")
    with pytest.raises(NotImplementedError, match="column mapping"):
        merge_additive_versioned(
            spark, b2, tbl, keys=("k",), sum_cols=("total",), n_buckets=4,
            txn_id="batch-2",
        )


def test_register_clone_pins_abspaths(tmp_path, monkeypatch):
    """ADVICE r8: _register_clone stored the pin list verbatim; relative
    manifest paths were then abspath'd against VACUUM's cwd. Pins are
    now absolutized at registration time."""
    owner = str(tmp_path / "src")
    os.makedirs(os.path.join(owner, "_snapshots"), exist_ok=True)
    monkeypatch.chdir(tmp_path)
    S._register_clone(owner, str(tmp_path / "clone"), pinned=["src/part-0.parquet"])
    marker_dir = os.path.join(owner, "_snapshots", "_clones")
    (marker,) = os.listdir(marker_dir)
    pinned = json.load(open(os.path.join(marker_dir, marker)))["pinned"]
    assert pinned == [str(tmp_path / "src" / "part-0.parquet")]


def test_pending_clone_outlives_orphan_window(spark, tmp_path):
    """ADVICE r8: pending-clone protection expired with orphan_retention_s
    (default 1h) — a clone publish slower than the orphan window lost its
    pins mid-flight. Protection now rides its own, much longer knob."""
    tbl = str(tmp_path / "src")
    S.overwrite_versioned(spark, spark.range(3).select(F.col("id").alias("k")), tbl)
    old_files = list(S.read_manifest(tbl)["files"])
    S.overwrite_versioned(spark, spark.range(5).select(F.col("id").alias("k")), tbl)
    # in-flight clone: marker registered (pinning v1's files), clone
    # manifest NOT yet published
    S._register_clone(tbl, str(tmp_path / "clone"), pinned=old_files)
    # orphan window disabled entirely: old code keyed pin protection on
    # orphan_retention_s > 0 and would delete v1's files here
    deleted = S.vacuum(tbl, keep_versions=1, orphan_retention_s=0)
    survivors = {os.path.abspath(f) for f in S._list_data_files(tbl)}
    assert {os.path.abspath(f) for f in old_files} <= survivors
    assert not deleted
    # aged-out pending marker (or an explicit 0 knob) releases the pins
    deleted = S.vacuum(
        tbl, keep_versions=1, orphan_retention_s=0, pending_clone_retention_s=0
    )
    assert {os.path.abspath(f) for f in deleted} == {os.path.abspath(f) for f in old_files}


def test_pq_topk_gates_query_id_type(spark):
    """ADVICE r8: string/UUID QUERY ids flowed through int(x) and a
    hardcoded 'q_id long' schema — opaque ValueError instead of the loud
    TypeError the corpus side already got."""
    from stellar_etl_airflow_spark.training import similarity as SIM

    corpus = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 3), i -> cast(id + i as double))").alias("embedding"),
    )
    cb = SIM.pq_train(corpus, m=2, n_iter=1)
    codes = SIM.pq_encode(corpus, cb, m=2)
    bad_queries = corpus.limit(2).select(
        F.col("vec_id").cast("string").alias("vec_id"), "embedding"
    )
    with pytest.raises(TypeError, match="query id.*integral"):
        SIM.pq_topk(codes, bad_queries, cb, m=2, k=2)


def test_racing_merges_both_land(spark, tmp_path):
    """Two writer threads race apply_changes on the same table (disjoint
    key ranges): the publish CAS detects the interleave and the r9
    conflict-retry rebases against the new version — both batches land,
    version chain dense, no lost update."""
    from concurrent.futures import ThreadPoolExecutor

    from stellar_etl_airflow_spark.operators.merge import apply_changes
    from stellar_etl_airflow_spark.sinks import snapshots as S

    tbl = str(tmp_path / "t")
    sch = "account_id long, balance long, deleted boolean, last_modified_ledger long, ledger_entry_change int"
    seed = spark.createDataFrame([(i, 0, False, 1, 0) for i in range(20)], sch)
    apply_changes(spark, seed, tbl, keys=("account_id",), n_buckets=8)

    def write_range(lo: int) -> None:
        batch = spark.createDataFrame(
            [(lo + i, lo + i, False, 2, 0) for i in range(10)], sch
        )
        apply_changes(spark, batch, tbl, keys=("account_id",), n_buckets=8,
                      txn_id=f"race-{lo}")

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(write_range, [0, 10]))

    got = {r["account_id"]: r["balance"] for r in S.read_snapshot(spark, tbl).collect()}
    assert got == {i: i for i in range(20)}, got
    m = S.read_manifest(tbl)
    assert m["version"] >= 3  # seed publish(es) + both merges
    assert set(m["txns"]) >= {"race-0", "race-10"}


def test_racing_additive_merges_exact_counters(spark, tmp_path):
    """The additive combine is NOT replay-idempotent, so the retry path
    must never double-apply: racing counter batches with txn ids land
    exactly once each."""
    from concurrent.futures import ThreadPoolExecutor

    from stellar_etl_airflow_spark.operators.merge import merge_additive_versioned
    from stellar_etl_airflow_spark.sinks import snapshots as S

    tbl = str(tmp_path / "t")

    def add(i: int) -> None:
        batch = spark.createDataFrame([(k, 1) for k in range(8)], "k long, n long")
        merge_additive_versioned(
            spark, batch, tbl, keys=("k",), sum_cols=("n",), n_buckets=4,
            txn_id=f"ctr-{i}",
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(add, range(4)))
    got = {r["k"]: r["n"] for r in S.read_snapshot(spark, tbl).collect()}
    assert got == {k: 4 for k in range(8)}, got
