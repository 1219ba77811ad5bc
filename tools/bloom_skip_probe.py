"""Measure manifest bloom-filter file pruning on a hash-like key
(sinks/snapshots: bloom_cols + prune_files): files planned and wall
clock for an equality probe vs the unpruned filtered read, at a file
count where planning cost is visible. [min, max] stats are recorded too
to demonstrate they prune NOTHING on a hashed key (every file's range
spans the hex space) while the blooms plan ~FPP x n_files. Prints one
JSON line (SCALE.md records the result).

Usage: python tools/bloom_skip_probe.py [n_rows] [n_files] [n_probes]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.session import get_spark
from stellar_etl_airflow_spark.sinks import snapshots as S


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_probes = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = get_spark("bloom-skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bloomprobe-")
    path = os.path.join(root, "t")
    try:
        df = spark.range(n_rows).select(
            F.md5(F.col("id").cast("string")).alias("h"),
            F.col("id").alias("v"),
        ).repartition(n_files, "h")
        t0 = time.perf_counter()
        S.overwrite_versioned(
            spark, df, path, stats_cols=("h",), bloom_cols=("h",)
        )
        publish_sec = round(time.perf_counter() - t0, 2)
        m = S.read_manifest(path)
        manifest_kb = os.path.getsize(
            S._manifest_path(path, m["version"])
        ) // 1024

        probes = [hashlib.md5(str(i).encode()).hexdigest() for i in range(n_probes)]

        # planning-only: how many files survive with stats alone vs both
        stats_only = {**m, "blooms": {}}
        stats_survivors = [len(S.prune_files(stats_only, [("h", "=", p)])) for p in probes]
        bloom_survivors = [len(S.prune_files(m, [("h", "=", p)])) for p in probes]

        def run_scan(kind, probe):
            t0 = time.perf_counter()
            if kind == "pruned":
                out = S.scan_snapshot(spark, path, [("h", "=", probe)])
            else:
                out = S.read_snapshot(spark, path).filter(F.col("h") == probe)
            rows = out.collect()
            return time.perf_counter() - t0, [r["v"] for r in rows]

        walls = {"full": [], "pruned": []}
        for rep in range(2):  # interleave 2 reps, min wins
            for kind in ("full", "pruned"):
                w_tot = 0.0
                for i, p in enumerate(probes):
                    w, vals = run_scan(kind, p)
                    assert vals == [i], f"{kind} probe {i}: {vals}"
                    w_tot += w
                walls[kind].append(round(w_tot / n_probes, 4))
        print(json.dumps({
            "n_rows": n_rows,
            "n_files_total": len(m["files"]),
            "publish_with_blooms_sec": publish_sec,
            "manifest_kb": manifest_kb,
            "mean_files_after_stats_prune": sum(stats_survivors) / n_probes,
            "mean_files_after_bloom_prune": sum(bloom_survivors) / n_probes,
            "wall_full_filter_sec_per_probe": min(walls["full"]),
            "wall_pruned_scan_sec_per_probe": min(walls["pruned"]),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
