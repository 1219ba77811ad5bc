"""Localize the q55 in-sweep 3x anomaly (VERDICT r11 ask #5).

Observed on two independent r11 runs: ``q55_snapshot_pushdown`` reads
~7 s inside a full per-query sweep but ~2.2 s isolated in a fresh
session — an in-JVM neighborhood effect the between-PASS hygiene
(clearCache + driver gc + System.gc, commit 4cc7ac7) fixed for the
pooled pass but not within the sweep.

Protocol (one session, sf from $SPARK_GRAFT_SF_DIR):

1. warm the JVM + Arrow path like bench.py, then time q55 FRESH;
2. run the alphabetical sweep prefix up to q55 (everything a real
   sweep runs before it), then time q55 CONTAMINATED;
3. apply the pass-hygiene (clearCache + gc.collect + System.gc +
   2 s drain) and time q55 HYGIENED — if this recovers the fresh wall,
   the fix is a hygiene cadence inside the sweep; if not, the state is
   not collectible (worker pool, code cache) and needs a different fix;
4. phase-split: the write half (orders -> Python Data Source snapshot
   table) and the read half (pushdown scan + collect) timed separately
   in each state, so the inflation names its phase.

Prints one JSON line per measurement and a summary verdict line.
Usage: python tools/q55_sweep_probe.py [--skip-heavy]  (--skip-heavy
drops the >5 s protocol entries from the prefix to separate "many
neighbors" from "heavy neighbors").
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.queries import QUERIES
from stellar_etl_airflow_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HEAVY = {
    "q51_incremental_mart",
    "s14_stream_incremental_dedup",
    "q61_zorder_optimize",
    "s08_stream_crash_resume",
}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_q55(spark) -> float:
    t0 = time.perf_counter()
    _noop(QUERIES["q55_snapshot_pushdown"].fn(spark, SF_DIR))
    return round(time.perf_counter() - t0, 3)


def time_q55_phases(spark) -> dict:
    """q55's two halves, timed separately (same code shape as the entry)."""
    from stellar_etl_airflow_spark.queries.base import tables
    from stellar_etl_airflow_spark.sources import snapshot_source

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    snapshot_source.register(spark)
    (orders,) = tables(spark, SF_DIR, "orders")
    path = os.path.join(tempfile.gettempdir(), f"q55probe-{uuid.uuid4().hex[:8]}")
    try:
        t0 = time.perf_counter()
        (
            orders.repartitionByRange(8, "o_orderkey")
            .write.format(snapshot_source.FORMAT_NAME)
            .option("path", path)
            .option("stats_cols", "o_orderkey")
            .mode("overwrite")
            .save()
        )
        t_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        sel = (
            spark.read.format(snapshot_source.FORMAT_NAME)
            .option("path", path)
            .load()
            .where((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000))
            .where(F.col("o_totalprice") > 50000.0)
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        )
        sel.collect()
        t_read = time.perf_counter() - t0
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return {"write_sec": round(t_write, 3), "read_sec": round(t_read, 3)}


def hygiene(spark) -> None:
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - best-effort
        pass
    time.sleep(2)


def main() -> None:
    skip_heavy = "--skip-heavy" in sys.argv
    spark = get_spark("q55-sweep-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmups so FRESH matches the sweep's steady state
    _noop(QUERIES["q01_pricing_summary"].fn(spark, SF_DIR))

    def _warm_arrow(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    _noop(
        spark.range(0, default_parallelism() * 2, 1, default_parallelism() * 2)
        .mapInPandas(_warm_arrow, "id long")
    )

    fresh = min(time_q55(spark), time_q55(spark))
    fresh_phases = time_q55_phases(spark)
    print(json.dumps({"state": "fresh", "q55_sec": fresh, **fresh_phases}), flush=True)

    prefix = [n for n in sorted(QUERIES) if n < "q55_snapshot_pushdown"]
    if skip_heavy:
        prefix = [n for n in prefix if n not in HEAVY]
    t0 = time.perf_counter()
    for name in prefix:
        _noop(QUERIES[name].fn(spark, SF_DIR))
    print(
        json.dumps(
            {"state": "prefix_done", "entries": len(prefix), "sec": round(time.perf_counter() - t0, 1)}
        ),
        flush=True,
    )

    contaminated = time_q55(spark)
    cont_phases = time_q55_phases(spark)
    print(
        json.dumps({"state": "contaminated", "q55_sec": contaminated, **cont_phases}),
        flush=True,
    )

    hygiene(spark)
    hygiened = time_q55(spark)
    hyg_phases = time_q55_phases(spark)
    print(json.dumps({"state": "hygiened", "q55_sec": hygiened, **hyg_phases}), flush=True)

    verdict = (
        "hygiene_recovers"
        if hygiened <= 1.5 * fresh and contaminated > 1.5 * fresh
        else "no_repro"
        if contaminated <= 1.5 * fresh
        else "hygiene_insufficient"
    )
    print(
        json.dumps(
            {
                "metric": "q55_sweep_probe",
                "verdict": verdict,
                "fresh": fresh,
                "contaminated": contaminated,
                "hygiened": hygiened,
                "skip_heavy": skip_heavy,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
