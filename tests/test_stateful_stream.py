"""applyInPandasWithState: state persists across separate AvailableNow
runs through the checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from stellar_etl_airflow_spark.streaming import microbatch as MB
from stellar_etl_airflow_spark.streaming.stateful import running_counts

SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run(spark, landing, out, ckpt):
    stream = MB.stream_ndjson(spark, landing, SCHEMA)

    # update-mode stateful output needs an update-capable sink: foreachBatch
    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        running_counts(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_state_across_runs(spark, tmp_path):
    landing, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    _write(os.path.join(landing, "b1.txt"), [{"user_id": 1, "value": 2.0}, {"user_id": 1, "value": 3.0}, {"user_id": 2, "value": 1.0}])
    _run(spark, landing, out, ckpt)
    first = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert first[1]["n_events"] == 2 and first[1]["total_value"] == 5.0
    assert first[2]["n_events"] == 1

    # second run: state restored from checkpoint, counts accumulate
    _write(os.path.join(landing, "b2.txt"), [{"user_id": 1, "value": 10.0}])
    _run(spark, landing, out, ckpt)
    rows = spark.read.parquet(out).collect()
    latest_u1 = max((r for r in rows if r["key"] == 1), key=lambda r: r["n_events"])
    assert latest_u1["n_events"] == 3 and latest_u1["total_value"] == 15.0


def test_transform_with_state_distinct_types(spark, tmp_path):
    """Spark 4 State API v2 (transformWithStateInPandas): per-key running
    distinct-set, drained AvailableNow, must equal count(DISTINCT ...).
    Requires the protobuf package (the API's worker protocol) and the
    RocksDB state store — skipped where the environment lacks them."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from stellar_etl_airflow_spark.streaming.stateful import distinct_types_tws

    sub = spark.newSession()
    sub.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    sub.conf.set("spark.sql.shuffle.partitions", "4")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df = spark.range(300).select(
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % (1 + F.col("id") % 4)).cast("string")).alias(
            "event_type"
        ),
    )
    df.write.parquet(src)
    stream = sub.readStream.schema("user_id long, event_type string").parquet(src)
    q = (
        distinct_types_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["key"]: (r["n_types"], r["types_csv"])
        for r in sub.sql(
            "select * from tws_out qualify row_number() over (partition by key order by n_types desc) = 1"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["csv"])
        for r in df.groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("n"),
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("csv"),
        )
        .collect()
    }
    assert got == want
