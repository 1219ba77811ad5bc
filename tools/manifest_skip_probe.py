"""Measure manifest-stats file pruning (sinks/snapshots.scan_snapshot):
files planned, bytes touched, and wall clock for a selective predicate
vs the unpruned filtered read, at a file count where planning cost is
visible. Prints one JSON line per configuration (SCALE.md records the
result).

Usage: python tools/manifest_skip_probe.py [n_rows] [n_files]
"""

from __future__ import annotations

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

    spark = get_spark("manifest-skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="skipprobe-")
    path = os.path.join(root, "t")
    try:
        df = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        ).repartitionByRange(n_files, "k")
        t0 = time.perf_counter()
        S.overwrite_versioned(spark, df, path, stats_cols=("k",))
        publish_sec = round(time.perf_counter() - t0, 2)
        m = S.read_manifest(path)

        lo, hi = n_rows // 2, n_rows // 2 + n_rows // 100  # ~1% slice
        where = [("k", ">=", lo), ("k", "<", hi)]

        def run(kind):
            t0 = time.perf_counter()
            if kind == "pruned":
                out = S.scan_snapshot(spark, path, where)
            else:
                out = S.read_snapshot(spark, path).filter(
                    (F.col("k") >= lo) & (F.col("k") < hi)
                )
            agg = out.agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.hash("k", "v")).alias("chk")
            ).collect()[0]
            return round(time.perf_counter() - t0, 3), agg["n"], agg["chk"]

        pruned_files = S.prune_files(m, where)
        res = {}
        for kind in ("full", "pruned", "full", "pruned"):  # interleave 2 reps
            w, cnt, chk = run(kind)
            res.setdefault(kind, []).append((w, cnt, chk))
        assert res["full"][0][1:] == res["pruned"][0][1:], "results diverge!"
        print(json.dumps({
            "n_rows": n_rows,
            "n_files_total": len(m["files"]),
            "n_files_after_prune": len(pruned_files),
            "publish_with_stats_sec": publish_sec,
            "rows_selected": res["pruned"][0][1],
            "wall_full_filter_sec": min(w for w, *_ in res["full"]),
            "wall_pruned_scan_sec": min(w for w, *_ in res["pruned"]),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
