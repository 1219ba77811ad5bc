"""Volume probe for the streaming-MoR-counter shape (s16 — VERDICT r11
ask #4).

s16's wall in the corpus bench is dominated by Structured Streaming
drain overhead (checkpoint setup + two availableNow restart cycles —
the s12/s13 pattern SCALE.md already characterizes). The volume term
is what this probe isolates: per-epoch ``groupBy(user).agg(count,
decimal-sum)`` over the events batch, the delta APPEND of that
aggregate (txn-ledgered), a mid-protocol FOLD of the pile, and the
replayed epoch's ledger no-op — the exact s16 protocol minus the
stream plumbing, driven directly at Kx volume.

Inputs are tools/scale_stress.py's replicated events tables
(``/tmp/scale-stress/sfK/events.parquet`` — run that first, or this
builds them via its ``build``). user_id offsets make DISTINCT USERS
grow Kx, so the delta rows, the append payload, and the fold's key
count all scale Kx — linear work by construction.

Usage: python tools/mor_counter_scale_probe.py [K ...] (default 1 10).
Prints per-K phase timings and a summary with ratios vs the first K.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators import additive_mor as AM
from stellar_etl_airflow_spark.session import get_spark, normalize_nanos

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_stress import build  # noqa: E402


def run_protocol(spark, events) -> dict:
    mart = os.path.join(tempfile.gettempdir(), f"mor-scale-{uuid.uuid4().hex[:8]}")
    timings: dict[str, float] = {}
    try:
        def delta(epoch: int) -> None:
            batch = events.groupBy(F.col("user_id").alias("k")).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
            )
            AM.write_delta(
                spark, batch, mart, ("k",), ("n_events", "total"),
                txn_id=f"epoch-{epoch}",
            )

        t0 = time.perf_counter()
        delta(0)
        delta(1)
        timings["epochs_01_sec"] = round(time.perf_counter() - t0, 2)
        # the operational compaction window: fold mid-protocol
        t0 = time.perf_counter()
        AM.fold_additive(spark, mart)
        timings["fold_sec"] = round(time.perf_counter() - t0, 2)
        # crash-replay of epoch 1 across the fold: must ledger-no-op
        t0 = time.perf_counter()
        v_before = __import__(
            "stellar_etl_airflow_spark.sinks.snapshots", fromlist=["latest_version"]
        ).latest_version(mart)
        delta(1)
        timings["replay_sec"] = round(time.perf_counter() - t0, 2)
        from stellar_etl_airflow_spark.sinks import snapshots as S

        assert S.latest_version(mart) == v_before, "replayed epoch published"
        t0 = time.perf_counter()
        delta(2)
        timings["epoch_2_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n = AM.read_additive(spark, mart).count()
        timings["read_fold_sec"] = round(time.perf_counter() - t0, 2)
        timings["distinct_users"] = n
        timings["total_sec"] = round(
            sum(v for k, v in timings.items() if k.endswith("_sec")), 2
        )
    finally:
        shutil.rmtree(mart, ignore_errors=True)
    return timings


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2")))
    spark = get_spark("mor-counter-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[int, dict] = {}
    for k in ks:
        sf_dir = build(spark, k)
        events = normalize_nanos(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        )
        best = None
        for _ in range(reps):
            t = run_protocol(spark, events)
            if best is None or t["total_sec"] < best["total_sec"]:
                best = t
        results[k] = best
        print(json.dumps({"k": k, **best, "reps": reps}), flush=True)
    base = ks[0]
    print(
        json.dumps(
            {
                "metric": "mor_counter_scale",
                "base_k": base,
                "entries": {
                    str(k): {
                        **t,
                        "ratio": round(
                            t["total_sec"] / max(results[base]["total_sec"], 1e-9), 2
                        ),
                    }
                    for k, t in results.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
