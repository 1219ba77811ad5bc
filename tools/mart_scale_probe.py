"""Volume probe for the r13 mart entries (q71/q74 shapes).

The 100 TB claim under test: the mart pipelines are broadcast-only on
the fact side (PLANS.md r13, plan-contract-tested), so wall must scale
~linearly with the TRADE side while the broadcast sides (pools, price
windows, meaningful assets) stay constant-cost — there is no fact-side
shuffle to go quadratic or skew. This probe replicates the EVENTS base
K-fold (probe_lib.k_replicas) and runs the full q71 and q74 pipelines
(derived inputs + the real views/marts.py code) over it. The derived
price series grows with K too (same source table), which makes the
probe CONSERVATIVE: the broadcast build sides are K x larger than
production (where price dimensions grow with time, not trade volume)
and must still stay cheap to build and broadcast.

Usage: python tools/mart_scale_probe.py [K ...] (default 1 10).
Timing via the alternating-A/B discipline (see sqlfn_scale_probe).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from stellar_etl_airflow_spark.queries.base import tables
from stellar_etl_airflow_spark.session import get_spark

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale-stress")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events_path(spark: SparkSession, k: int) -> str:
    from probe_lib import k_replicas

    out = os.path.join(ROOT, f"mart-events-{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    (ev,) = tables(spark, SF_DIR, "events")
    k_replicas(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        k,
        {"event_id": 10**12, "user_id": 10**9},
    ).write.mode("overwrite").parquet(out)
    open(os.path.join(out, "_DONE"), "w").close()
    return out


class _SfDirShim:
    """Feed the entry functions a directory whose events.parquet is the
    K-replicated table while every other table resolves to the base SF
    (the entries only read events)."""

    def __init__(self, spark, k):
        self.dir = os.path.join(ROOT, f"mart-sfdir-{k}")
        os.makedirs(self.dir, exist_ok=True)
        ev = _events_path(spark, k)
        link = os.path.join(self.dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(ev, link)


def _time_pair(thunks, reps=3):
    for t in thunks:
        t()
    walls = [[] for _ in thunks]
    for _ in range(reps):
        for i, t in enumerate(thunks):
            t0 = time.perf_counter()
            t()
            walls[i].append(time.perf_counter() - t0)
    return [round(min(w), 3) for w in walls]


def main() -> None:
    from stellar_etl_airflow_spark.queries.relational3 import (
        q71_trade_volume_mart,
        q74_relevant_asset_trades,
    )

    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("mart-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROOT, exist_ok=True)
    results = {}
    for k in ks:
        shim = _SfDirShim(spark, k)
        q71, q74 = _time_pair([
            lambda: q71_trade_volume_mart(spark, shim.dir)
            .write.format("noop").mode("overwrite").save(),
            lambda: q74_relevant_asset_trades(spark, shim.dir)
            .write.format("noop").mode("overwrite").save(),
        ])
        results[k] = {"k": k, "q71_sec": q71, "q74_sec": q74}
        print(json.dumps(results[k]), flush=True)
    if len(ks) > 1:
        k0, k1 = ks[0], ks[-1]
        print(json.dumps({
            "summary": "fact-side scaling, broadcast sides constant",
            "volume_ratio": k1 / k0,
            "q71_wall_ratio": round(results[k1]["q71_sec"] / results[k0]["q71_sec"], 2),
            "q74_wall_ratio": round(results[k1]["q74_sec"] / results[k0]["q74_sec"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
