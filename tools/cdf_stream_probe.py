"""Volume probe for the streaming CDF->SCD2 path (the s12 corpus shape;
r8, VERDICT r7 ask #7): a merge table's Change Data Feed is tailed as a
stream and each micro-batch drives scd2_apply_cdf. Measures, at K and
10K event volume (base state and churn both scaled):

- ``drain_wall_s``: stream start -> availableNow termination, the
  corpus-entry cost (includes the fixed checkpoint/restart overhead the
  VERDICT identified as s12's dominant term at sf0.1);
- ``fold_wall_s``: the scd2_apply_cdf folds alone (per-batch work);
- ``history_rows``: SCD-2 state growth (open + closed rows).

Expectation: drain wall grows SUBLINEARLY with volume (the streaming
fixed costs amortize) and history rows grow ~linearly with churn —
each churned key adds one closed + one open row; the fold itself is a
broadcast-anti-join against the churned-key set, never a full-state
pass. Prints one JSON line per size for SCALE.md.

Usage: python tools/cdf_stream_probe.py [sizes...]   (default 30000 300000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.cdf import CHANGE_TYPE_COL
from stellar_etl_airflow_spark.operators.merge import BUCKET_COL, apply_changes
from stellar_etl_airflow_spark.operators.scd2 import scd2_apply_cdf, scd2_init
from stellar_etl_airflow_spark.session import get_spark
from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.streaming import cdf_source

TS1, TS2 = datetime(2024, 1, 1), datetime(2024, 1, 2)


def run_once(spark, n: int) -> dict:
    churn = n // 10
    base = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.lit(1).alias("seq"),
        (F.col("id") * 2).alias("value"),
        F.lit(False).alias("deleted"),
    )
    # churn: updates on 8%, deletes on 1%, inserts 1%
    upd = spark.range(churn * 4 // 5).select(
        F.col("id").alias("user_id"), F.lit(2).alias("seq"),
        F.lit(-1).alias("value"), F.lit(False).alias("deleted"),
    )
    dels = spark.range(n // 2, n // 2 + churn // 10).select(
        F.col("id").alias("user_id"), F.lit(2).alias("seq"),
        F.lit(0).alias("value"), F.lit(True).alias("deleted"),
    )
    ins = spark.range(n, n + churn // 10).select(
        F.col("id").alias("user_id"), F.lit(2).alias("seq"),
        (F.col("id") * 2).alias("value"), F.lit(False).alias("deleted"),
    )
    cols = ["user_id", "seq", "value"]
    run = uuid.uuid4().hex[:8]
    path = os.path.join(tempfile.gettempdir(), f"cdfprobe-{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"cdfprobe-ckpt-{run}")
    fold_wall = [0.0]
    try:
        v1, _ = apply_changes(
            spark, base, path, ("user_id",), n_buckets=8, order_cols=("seq",)
        )
        holder = {
            "snap": scd2_init(
                S.read_snapshot(spark, path, v1).drop(BUCKET_COL).select(*cols),
                ("user_id",), TS1,
            ).localCheckpoint(eager=True)
        }
        apply_changes(
            spark, upd.union(dels).union(ins), path, ("user_id",),
            n_buckets=8, order_cols=("seq",),
        )
        cdf_source.register(spark)

        def fb(batch_df, _bid):
            ch = batch_df.select(*cols, CHANGE_TYPE_COL)
            rows = ch.collect()  # churn-sized bridge, same as s12
            if not rows:
                return
            t0 = time.perf_counter()
            holder["snap"] = scd2_apply_cdf(
                holder["snap"], spark.createDataFrame(rows, ch.schema),
                ("user_id",), TS2,
            ).localCheckpoint(eager=True)
            fold_wall[0] += time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            spark.readStream.format(cdf_source.FORMAT_NAME)
            .option("path", path)
            .option("startingVersion", str(v1))
            .load()
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        drain = time.perf_counter() - t0
        hist = holder["snap"].count()
        return {
            "events": n,
            "churn": churn,
            "drain_wall_s": round(drain, 2),
            "fold_wall_s": round(fold_wall[0], 2),
            "history_rows": hist,
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [30_000, 300_000]
    spark = get_spark("cdf-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        r = run_once(spark, n)
        out.append(r)
        print(json.dumps(r), flush=True)
    if len(out) >= 2:
        ratio = out[-1]["drain_wall_s"] / max(out[0]["drain_wall_s"], 1e-9)
        vol = out[-1]["events"] / out[0]["events"]
        print(json.dumps({"volume_ratio": vol, "drain_wall_ratio": round(ratio, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
