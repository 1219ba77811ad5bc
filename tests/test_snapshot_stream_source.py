"""readStream.format("snapshot") — the streaming SOURCE over versioned
tables (sources/snapshot_source.py::_SnapshotStreamReader): initial
snapshot + appended-files micro-batches, Delta's append-only contract
with ignoreChanges, checkpoint resume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.sources import snapshot_source


@pytest.fixture(autouse=True)
def _register(spark):
    snapshot_source.register(spark)


def _drain(spark, path, ckpt, sink, **opts):
    r = spark.readStream.format("snapshot").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink)


def test_stream_source_initial_snapshot_then_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    spark.range(0, 10).select("id").write.format("snapshot").option(
        "path", path
    ).mode("overwrite").save()

    # first drain: the whole existing table (Delta's initial snapshot)
    got = _drain(spark, path, ckpt, sink)
    assert sorted(r["id"] for r in got.collect()) == list(range(10))

    # append-only growth between drains: only the new rows stream
    spark.range(10, 15).select("id").write.format("snapshot").option(
        "path", path
    ).mode("append").save()
    got = _drain(spark, path, ckpt, sink)
    assert sorted(r["id"] for r in got.collect()) == list(range(15))  # sink total
    # the second drain appended exactly 5 rows (no re-read of the base)
    assert got.count() == 15


def test_stream_source_rejects_rewrites_unless_ignore_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    spark.range(0, 5).select("id").write.format("snapshot").option(
        "path", path
    ).mode("overwrite").save()
    _drain(spark, path, ckpt, sink)

    # a REWRITE (overwrite) breaks append-only: the stream must refuse
    spark.range(100, 103).select("id").write.format("snapshot").option(
        "path", path
    ).mode("overwrite").save()
    with pytest.raises(Exception, match="not append-only"):
        _drain(spark, path, ckpt, sink)

    # ignoreChanges: stream the added files only (Delta's contract)
    got = _drain(spark, path, ckpt, sink, ignoreChanges="true")
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2, 3, 4, 100, 101, 102]


def test_stream_source_starting_version(spark, tmp_path):
    path = str(tmp_path / "t")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    spark.range(0, 5).select("id").write.format("snapshot").option(
        "path", path
    ).mode("overwrite").save()
    v1 = S.latest_version(path)
    spark.range(5, 8).select("id").write.format("snapshot").option(
        "path", path
    ).mode("append").save()

    got = _drain(spark, path, ckpt, sink, startingVersion=str(v1))
    assert sorted(r["id"] for r in got.collect()) == [5, 6, 7]


def test_stream_source_roundtrip_with_stream_sink(spark, tmp_path):
    """Full connector symmetry: snapshot table -> readStream -> writeStream
    -> snapshot table, exactly-once on both ends."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 20).select("id", (F.col("id") % 3).alias("g")).write.format(
        "snapshot"
    ).option("path", src).mode("overwrite").save()

    q = (
        spark.readStream.format("snapshot").option("path", src).load()
        .where(F.col("g") == 0)
        .writeStream.format("snapshot")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.format("snapshot").option("path", dst).load()
    assert sorted(r["id"] for r in out.collect()) == [i for i in range(20) if i % 3 == 0]
    m = S.read_manifest(dst)
    assert any(k.startswith("snapshot_stream:") for k in m["txns"])
