"""Partition-scoped MERGE: BigQuery-targeted-rewrite cost profile over
hash-bucketed parquet — only buckets containing changed keys are rewritten
(reference: build_apply_gcs_changes_to_bq_task.py:116-149)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators import merge as MG


def _files(path):
    """{leaf_dir: {(name, inode, mtime_ns)}} for every bucket dir."""
    out = {}
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith(MG.BUCKET_COL + "=") and os.path.isdir(full):
            out[d] = {
                (f, os.stat(os.path.join(full, f)).st_ino, os.stat(os.path.join(full, f)).st_mtime_ns)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def _state(spark, path):
    return {
        r["account_id"]: r["balance"]
        for r in spark.read.parquet(path).select("account_id", "balance").collect()
    }


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "account_id long, balance double, deleted boolean, last_modified_ledger long, ledger_entry_change long"
    )


def test_scoped_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "accounts_state")
    n_buckets = 16
    seed = _changes(spark, [(i, float(i), False, 1, 1) for i in range(200)])
    MG.merge_upsert_scoped(spark, seed, path, ("account_id",), n_buckets)
    assert _state(spark, path)[7] == 7.0
    before = _files(path)
    assert len(before) > 4  # seed really spread over several buckets

    # one-key batch: update account 7
    batch = _changes(spark, [(7, 700.0, False, 2, 1)])
    touched = MG.merge_upsert_scoped(spark, batch, path, ("account_id",), n_buckets)
    (bucket_of_7,) = touched

    after = _files(path)
    assert set(after) == set(before)
    for d, files in before.items():
        if d == f"{MG.BUCKET_COL}={bucket_of_7}":
            assert after[d] != files  # the touched bucket was rewritten
        else:
            assert after[d] == files  # same names, inodes, mtimes — untouched

    st = _state(spark, path)
    assert st[7] == 700.0 and st[8] == 8.0 and len(st) == 200


def test_scoped_merge_delete_insert_and_idempotent_replay(spark, tmp_path):
    path = str(tmp_path / "state")
    seed = _changes(spark, [(i, float(i), False, 1, 1) for i in range(50)])
    MG.merge_upsert_scoped(spark, seed, path, ("account_id",), n_buckets=8)

    # batch: delete 3, update 4 (two in-batch versions — latest wins),
    # insert 1000
    batch = _changes(
        spark,
        [(3, 0.0, True, 2, 1), (4, 40.0, False, 2, 1), (4, 44.0, False, 2, 2), (1000, 1.0, False, 2, 1)],
    )
    MG.merge_upsert_scoped(spark, batch, path, ("account_id",), n_buckets=8)
    st = _state(spark, path)
    assert 3 not in st and st[4] == 44.0 and st[1000] == 1.0 and len(st) == 50

    # replaying the same batch is a no-op (crash-recovery contract)
    MG.merge_upsert_scoped(spark, batch, path, ("account_id",), n_buckets=8)
    assert _state(spark, path) == st


def test_scoped_merge_empties_then_refills_bucket(spark, tmp_path):
    """Deleting every key in a bucket leaves a file-less leaf; a later
    insert into the same bucket must work and scans must stay clean."""
    path = str(tmp_path / "state")
    df = _changes(spark, [(i, 1.0, False, 1, 1) for i in range(20)])
    MG.merge_upsert_scoped(spark, df, path, ("account_id",), n_buckets=4)
    # find all ids in bucket 0
    b = {
        r["account_id"]: r["_b"]
        for r in df.withColumn("_b", MG.key_bucket(("account_id",), 4)).collect()
    }
    bucket0_ids = [i for i, v in b.items() if v == 0]
    assert bucket0_ids
    wipe = _changes(spark, [(i, 0.0, True, 2, 1) for i in bucket0_ids])
    MG.merge_upsert_scoped(spark, wipe, path, ("account_id",), n_buckets=4)
    st = _state(spark, path)
    assert not set(bucket0_ids) & set(st) and len(st) == 20 - len(bucket0_ids)

    refill = _changes(spark, [(bucket0_ids[0], 9.0, False, 3, 1)])
    MG.merge_upsert_scoped(spark, refill, path, ("account_id",), n_buckets=4)
    assert _state(spark, path)[bucket0_ids[0]] == 9.0


def test_scoped_merge_crash_mid_swap_recovers(spark, tmp_path):
    from stellar_etl_airflow_spark.operators.ingest import Warehouse

    wh = Warehouse(str(tmp_path))
    path = wh.path("state")
    seed = _changes(spark, [(i, float(i), False, 1, 1) for i in range(40)])
    MG.merge_upsert_scoped(spark, seed, path, ("account_id",), n_buckets=4)

    # simulate a crash between the two renames of one bucket's swap
    leaf = os.path.join(path, f"{MG.BUCKET_COL}=1")
    os.rename(leaf, MG.backup_path(leaf))
    assert wh.recover() == [os.path.join("state", f"{MG.BUCKET_COL}=1")]
    assert len(_state(spark, path)) == 40
