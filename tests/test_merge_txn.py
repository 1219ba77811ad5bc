"""Transactional exactly-once merges (r6): the manifest's applied-txn
ledger must turn at-least-once redelivery into exactly-once for
NON-idempotent (additive) merges — the guarantee the latest-per-key paths
get from idempotence (s08) but counters cannot. Delta's txnAppId/
txnVersion idea on the manifest log; the reference's analog is the
del+ins batch protocol keyed on (batch_run_date, batch_id)
(build_del_ins_from_gcs_to_bq_task.py:74-104)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import (
    apply_changes,
    merge_additive_versioned,
)
from stellar_etl_airflow_spark.sinks import snapshots as S

from .conftest import SF_SMOKE


def _counts(spark, path, version=None):
    return {
        r["k"]: (r["n"], float(r["total"]))
        for r in S.read_snapshot(spark, path, version=version).collect()
    }


def test_additive_replay_with_txn_is_noop(spark, tmp_path):
    path = str(tmp_path / "mart")
    b1 = spark.createDataFrame([("a", 2, 10.0), ("b", 1, 5.0)], "k string, n long, total double")
    b2 = spark.createDataFrame([("a", 3, 7.0)], "k string, n long, total double")

    v1, t1 = merge_additive_versioned(spark, b1, path, ("k",), ("n", "total"), n_buckets=4, txn_id="batch-1")
    v2, t2 = merge_additive_versioned(spark, b2, path, ("k",), ("n", "total"), n_buckets=4, txn_id="batch-2")
    assert _counts(spark, path) == {"a": (5, 17.0), "b": (1, 5.0)}

    # replays: same txn ids — must return the original versions, publish
    # nothing, and leave the counters exactly once
    rv1, rt1 = merge_additive_versioned(spark, b1, path, ("k",), ("n", "total"), n_buckets=4, txn_id="batch-1")
    rv2, rt2 = merge_additive_versioned(spark, b2, path, ("k",), ("n", "total"), n_buckets=4, txn_id="batch-2")
    assert (rv1, rt1) == (v1, []) and (rv2, rt2) == (v2, [])
    assert S.latest_version(path) == v2
    assert _counts(spark, path) == {"a": (5, 17.0), "b": (1, 5.0)}

    # WITHOUT a txn id the replay double-counts — the hazard the ledger
    # exists to close
    merge_additive_versioned(spark, b2, path, ("k",), ("n", "total"), n_buckets=4)
    assert _counts(spark, path)["a"] == (8, 24.0)


def test_txn_ledger_survives_merges_and_clones(spark, tmp_path):
    path, cl = str(tmp_path / "t"), str(tmp_path / "c")
    b = spark.createDataFrame([("a", 1, 1.0)], "k string, n long, total double")
    v1, _ = merge_additive_versioned(spark, b, path, ("k",), ("n", "total"), n_buckets=2, txn_id="x")
    merge_additive_versioned(spark, b, path, ("k",), ("n", "total"), n_buckets=2, txn_id="y")
    S.clone(path, cl)
    # the clone keeps exactly-once against the same upstream replays
    rv, rt = merge_additive_versioned(spark, b, cl, ("k",), ("n", "total"), n_buckets=2, txn_id="x")
    assert rt == []
    assert _counts(spark, cl) == {"a": (2, 2.0)}
    # upsert path carries the ledger too
    ch = spark.createDataFrame(
        [("a", 9.0, 1, 200, 0, False)],
        "account_id string, balance double, sequence_number long, "
        "last_modified_ledger long, ledger_entry_change long, deleted boolean",
    )
    st = str(tmp_path / "state")
    sv, stouched = apply_changes(spark, ch, st, ("account_id",), n_buckets=2, txn_id="e0")
    rv2, rt2 = apply_changes(spark, ch, st, ("account_id",), n_buckets=2, txn_id="e0")
    assert (rv2, rt2) == (sv, [])


def test_streaming_additive_crash_resume_exactly_once(spark, tmp_path):
    """The decisive scenario: an ADDITIVE mart maintained by foreachBatch,
    crashed after a batch's merge committed but before its offset commit.
    The checkpoint replays that batch; without the txn ledger its counters
    would DOUBLE. With txn_id = epoch id, the resumed drain converges to
    the batch GROUP BY oracle."""
    import pytest

    from stellar_etl_airflow_spark.session import normalize_nanos

    src = os.path.abspath(os.path.join(SF_SMOKE, "events.parquet"))
    stream_dir = tmp_path / "src"
    stream_dir.mkdir()
    for i in range(3):
        os.symlink(src, stream_dir / f"d{i}.parquet")
    ckpt = str(tmp_path / "ckpt")
    mart = str(tmp_path / "mart")
    raw_schema = spark.read.parquet(src).schema

    def mk_stream():
        return normalize_nanos(
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir))
        )

    applied: list[int] = []

    def sink(crash_after):
        def fn(bdf, epoch_id):
            batch = (
                bdf.groupBy(F.col("user_id").alias("k"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
                )
            )
            merge_additive_versioned(
                spark, batch, mart, keys=("k",), sum_cols=("n", "total"),
                n_buckets=4, txn_id=f"epoch-{epoch_id}",
            )
            applied.append(epoch_id)
            if crash_after is not None and len(applied) == crash_after:
                raise RuntimeError("injected crash after merge")

        return fn

    q1 = (
        mk_stream().writeStream.foreachBatch(sink(2))
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination()
    q2 = (
        mk_stream().writeStream.foreachBatch(sink(None))
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    # epoch 1 ran twice (once before the crash, once replayed) — the
    # ledger must have made the replay a no-op
    assert sorted(applied) == [0, 1, 1, 2]

    from decimal import Decimal

    ev = normalize_nanos(spark.read.parquet(src))
    want = {
        r["k"]: (r["n"], r["total"])
        for r in ev.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
        )
        .withColumn("n", F.col("n") * 3)  # three deliveries
        .withColumn("total", F.col("total") * 3)
        .collect()
    }
    got = {
        r["k"]: (r["n"], r["total"])
        for r in S.read_snapshot(spark, mart).collect()
    }
    assert got == want
