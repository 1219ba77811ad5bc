"""Multimodal resize / audio-feature stubs and streaming session_window."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.streaming import microbatch as MB
from stellar_etl_airflow_spark.training import multimodal as M


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world document"), (2, "another payload with more bytes in it")],
        "doc_id long, text string",
    )
    return M.attach_payload(docs)


def test_resize_images(spark):
    out = {r["doc_id"]: r for r in M.resize_images(_media(spark), 128, 64).collect()}
    assert out[1]["width"] == 128 and out[1]["height"] == 64
    # byte budget scales with target area, deterministic
    assert out[1]["n_bytes"] == out[2]["n_bytes"] == max(16, 128 * 64 // 64)
    assert isinstance(out[1]["payload"], (bytes, bytearray))


def test_audio_features(spark):
    rows = M.extract_audio_features(_media(spark)).collect()
    assert len(rows) == 2
    for r in rows:
        assert 500 <= r["duration_ms"] < 60_500
        assert r["sample_rate"] in (8000, 16000, 44100, 48000)
        assert 0.0 <= r["rms_energy"] <= 1.0
    # deterministic across runs
    again = M.extract_audio_features(_media(spark)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_session_window_stream(spark, tmp_path):
    landing = tmp_path / "in"
    os.makedirs(landing)
    t0 = datetime(2024, 1, 1)
    rows = [
        {"user_id": 1, "ts": (t0 + timedelta(minutes=m)).isoformat()} for m in (0, 5, 10)
    ] + [{"user_id": 1, "ts": (t0 + timedelta(hours=3)).isoformat()}]
    with open(landing / "b.txt", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("user_id long, ts string").json(str(landing))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        MB.session_counts(stream, "ts", "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir).collect()
    # first session (3 events within 30-min gaps) closed by the 3-hour jump
    closed = [r for r in got if r["n_events"] == 3]
    assert len(closed) == 1
    assert closed[0]["session_start"] == t0
