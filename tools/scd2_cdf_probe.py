"""Measure incremental SCD-2 maintenance (operators/scd2.scd2_apply_cdf)
against the full-state dbt-snapshot path (scd2_apply) as the HISTORY
grows and the per-batch churn stays fixed — the 100 TB access pattern
(a dimension accumulates years of rows; a day touches a sliver).

Both paths produce identical snapshots (asserted via order-insensitive
checksum); the measurement is the wall to PLAN+MATERIALIZE the next
snapshot. The full-state path hash-joins the whole open set against the
whole new state; the CDF path broadcast-anti-joins the history against
the churned-key set only. Prints one JSON line per history size
(SCALE.md records the result).

Usage: python tools/scd2_cdf_probe.py [churn_keys] [sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators import scd2 as S2
from stellar_etl_airflow_spark.operators.cdf import CHANGE_TYPE_COL
from stellar_etl_airflow_spark.session import get_spark

TS1, TS2 = datetime(2024, 1, 1), datetime(2024, 1, 2)


def _checksum(df):
    return (
        df.select(F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(df.columns)])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("c"))
        .collect()[0]["c"]
    )


def main() -> None:
    churn = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    sizes = [int(x) for x in sys.argv[2:]] or [200_000, 2_000_000]
    spark = get_spark("scd2-cdf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        base = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
        )
        snap = S2.scd2_init(base, ("k",), TS1).localCheckpoint(eager=True)
        # churned keys: updates on a slice, some deletes, some inserts
        upd = spark.range(churn).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("v"),
            F.lit("update_postimage").alias(CHANGE_TYPE_COL),
        )
        dels = spark.range(churn, churn + churn // 5).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v"),
            F.lit("delete").alias(CHANGE_TYPE_COL),
        )
        ins = spark.range(n, n + churn // 5).select(
            F.col("id").alias("k"), F.lit(7.0).alias("v"),
            F.lit("insert").alias(CHANGE_TYPE_COL),
        )
        changes = upd.unionByName(dels).unionByName(ins).localCheckpoint(eager=True)
        # the equivalent full new state for scd2_apply
        new_state = (
            base.filter((F.col("k") >= churn + churn // 5) | (F.col("k") < churn))
            .withColumn("v", F.when(F.col("k") < churn, -1.0).otherwise(F.col("v")))
            .unionByName(ins.drop(CHANGE_TYPE_COL))
            .localCheckpoint(eager=True)
        )

        def run(fn):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = fn()
                cs = _checksum(out)
                dt = time.perf_counter() - t0
                best = min(best, dt) if best else dt
            return best, cs

        t_full, cs_full = run(lambda: S2.scd2_apply(snap, new_state, ("k",), TS2, check_unique=False))
        t_cdf, cs_cdf = run(lambda: S2.scd2_apply_cdf(snap, changes, ("k",), TS2))
        print(json.dumps({
            "history_rows": n, "churn_keys": churn,
            "full_state_sec": round(t_full, 3), "cdf_sec": round(t_cdf, 3),
            "speedup": round(t_full / t_cdf, 2),
            "identical": bool(cs_full == cs_cdf),
        }))


if __name__ == "__main__":
    main()
