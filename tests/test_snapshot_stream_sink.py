"""writeStream.format("snapshot") — the streaming twin of the batch
Data Source writer: per-micro-batch manifest publication with
EXACTLY-ONCE replay protection via the txn ledger
(sources/snapshot_source.py::_SnapshotStreamWriter).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.sources import snapshot_source
from stellar_etl_airflow_spark.sources.snapshot_source import _SnapshotStreamWriter


@pytest.fixture(autouse=True)
def _register(spark):
    snapshot_source.register(spark)


def test_stream_sink_appends_per_microbatch(spark, tmp_path):
    src = str(tmp_path / "src")
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    spark.range(0, 50).select(F.col("id"), (F.col("id") % 7).alias("g")).write.parquet(src)

    q = (
        spark.readStream.schema("id long, g long").parquet(src)
        .writeStream.format(snapshot_source.FORMAT_NAME)
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .option("stats_cols", "id")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert S.latest_version(path) >= 1
    back = spark.read.format("snapshot").option("path", path).load()
    assert back.count() == 50
    assert {r["id"] for r in back.collect()} == set(range(50))
    m = S.read_manifest(path)
    # every micro-batch recorded its ledger key; per-file stats present
    assert any(k.startswith("snapshot_stream:") for k in m["txns"])
    assert all(f in m["stats"] for f in m["files"])

    # a second drain over NEW source files appends, never rewrites
    spark.range(50, 80).select(F.col("id"), (F.col("id") % 7).alias("g")).write.mode(
        "append"
    ).parquet(src)
    q = (
        spark.readStream.schema("id long, g long").parquet(src)
        .writeStream.format(snapshot_source.FORMAT_NAME)
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.format("snapshot").option("path", path).load().count() == 80


def _msg(w, rows):
    tbl = pa.table({"id": pa.array(rows, type=pa.int64())})
    return w.write(iter(tbl.to_batches()))


def test_stream_sink_redelivered_batch_is_noop(spark, tmp_path):
    """The s08 crash window, at the sink: commit succeeded, checkpoint
    offset didn't — Structured Streaming re-runs the SAME batchId. The
    ledger makes the redelivery publish nothing and drop its files."""
    path = str(tmp_path / "t")
    w = _SnapshotStreamWriter({"path": path}, overwrite=False)

    w.commit([_msg(w, [1, 2, 3])], batchId=0)
    v1 = S.latest_version(path)
    n1 = len(S.read_manifest(path)["files"])

    # redelivery of batch 0: same batchId, fresh attempt files
    replay = _msg(w, [1, 2, 3])
    w.commit([replay], batchId=0)
    assert S.latest_version(path) == v1
    assert len(S.read_manifest(path)["files"]) == n1
    assert not os.path.exists(replay.file)  # replay attempt swept

    # the NEXT batch still lands
    w.commit([_msg(w, [4, 5])], batchId=1)
    assert S.latest_version(path) == v1 + 1
    back = spark.read.format("snapshot").option("path", path).load()
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3, 4, 5]

    # distinct appid = distinct ledger namespace: batch 0 of another
    # query is NOT a replay of this one's batch 0
    w2 = _SnapshotStreamWriter({"path": path, "appid": "other"}, overwrite=False)
    w2.commit([_msg(w2, [99])], batchId=0)
    assert S.latest_version(path) == v1 + 2


def test_stream_sink_abort_drops_files(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _SnapshotStreamWriter({"path": path}, overwrite=False)
    m1 = _msg(w, [1])
    w.abort([m1], batchId=0)
    assert not os.path.exists(m1.file)
    assert S.latest_version(path) is None
