"""Volume probe for the schema-evolving merge (q67 — VERDICT r12 ask #4).

The 100 TB claim under test: ``apply_changes(...,
allow_schema_evolution=True)`` (the reference's ALLOW_FIELD_ADDITION
merge) costs O(touched buckets), not O(table) — on a table grown 10x,
a same-size evolving change batch must rewrite the SAME number of
bucket files and take roughly the SAME wall, while untouched buckets
keep their old-schema files (read back through the mergeSchema path
with NULL-filled new columns).

Protocol per K: build a bucketed state table from K x sf0.1 events
(id-offset replication, 64 buckets), then apply ONE fixed-size change
batch (the base replica's ``user_id % 100 == 0`` slice — ~1% of KEYS,
so the batch hashes to a strict bucket subset — carrying a NEW
``segment`` column) with evolution on. Report: merge
wall, files rewritten (manifest diff) vs total files, and a read-back
aggregate over old+new rows to prove the mixed-schema table plans.

Usage: python tools/merge_evolution_probe.py [K ...] (default 1 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from stellar_etl_airflow_spark.operators.merge import apply_changes
from stellar_etl_airflow_spark.queries.base import tables
from stellar_etl_airflow_spark.session import get_spark
from stellar_etl_airflow_spark.sinks import snapshots as S

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale-stress")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 64


def _events_k(spark: SparkSession, k: int):
    from probe_lib import k_replicas

    (ev,) = tables(spark, SF_DIR, "events")
    return k_replicas(
        ev.select("user_id", "ts", "event_id", "value"),
        k,
        {"user_id": 10**9, "event_id": 10**12},
    )


def run(spark: SparkSession, k: int) -> dict:
    path = os.path.join(ROOT, f"evolve-{k}")
    shutil.rmtree(path, ignore_errors=True)
    base = _events_k(spark, k).withColumn("deleted", F.lit(False))
    apply_changes(spark, base, path, ("user_id",), n_buckets=N_BUCKETS,
                  order_cols=("ts", "event_id"))
    m0 = S.read_manifest(path, resolve=False)
    files0 = set(m0["files"])

    # fixed-size evolving batch: ~1% of the BASE replica's KEYS (the
    # touched-buckets-only claim needs a batch whose keys hash to a
    # strict bucket subset — a batch touching every user touches every
    # bucket and the probe would measure a full rewrite by design)
    (ev,) = tables(spark, SF_DIR, "events")
    batch = (
        ev.where(F.col("user_id") % 100 == 0)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "ts",
            F.col("event_id").cast("long").alias("event_id"),
            "value",
            F.lit(False).alias("deleted"),
            F.concat(F.lit("seg-"), (F.col("user_id") % 4).cast("string")).alias("segment"),
        )
    )
    n_batch = batch.count()
    t0 = time.perf_counter()
    apply_changes(spark, batch, path, ("user_id",), n_buckets=N_BUCKETS,
                  order_cols=("ts", "event_id"), allow_schema_evolution=True)
    merge_wall = round(time.perf_counter() - t0, 3)

    m1 = S.read_manifest(path, resolve=False)
    files1 = set(m1["files"])
    rewritten = len(files1 - files0)
    kept = len(files0 & files1)

    # mixed-schema read-back: old-schema files NULL-fill the new column
    t0 = time.perf_counter()
    agg = (
        S.read_snapshot(spark, path)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count("segment").alias("segmented"),
        )
        .collect()[0]
    )
    read_wall = round(time.perf_counter() - t0, 3)
    out = {
        "k": k,
        "table_rows": int(agg["rows"]),
        "batch_rows": int(n_batch),
        "segmented_rows": int(agg["segmented"]),
        "merge_wall_sec": merge_wall,
        "files_total": len(files1),
        "files_rewritten": rewritten,
        "files_kept": kept,
        "mixed_read_wall_sec": read_wall,
        "mixed_schema_flag": bool(m1.get("mixed_schema")),
    }
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("merge-evolution-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROOT, exist_ok=True)
    results: dict[int, dict] = {}
    for k in ks:
        results[k] = run(spark, k)
        print(json.dumps(results[k]), flush=True)
    if len(ks) > 1:
        k0, k1 = ks[0], ks[-1]
        print(json.dumps({
            "summary": "same-size evolving batch on a grown table",
            "volume_ratio": k1 / k0,
            "merge_wall_ratio": round(results[k1]["merge_wall_sec"] / results[k0]["merge_wall_sec"], 2),
            "rewritten_ratio": round(results[k1]["files_rewritten"] / max(1, results[k0]["files_rewritten"]), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
