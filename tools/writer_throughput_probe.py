"""Measure the snapshot Data Source WRITE path against the library
publish path (JVM parquet write + overwrite_versioned) at the same row
volume — the honest cost of crossing the Arrow/Python boundary per
batch, which is the price of computing manifest stats+blooms where the
data already is.

Prints one JSON line per configuration (SCALE.md records the result).

Usage: python tools/writer_throughput_probe.py [n_rows] [n_parts]
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

from stellar_etl_airflow_spark.session import get_spark
from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.sources import snapshot_source


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("writer-probe")
    spark.sparkContext.setLogLevel("ERROR")
    snapshot_source.register(spark)
    df = (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("h"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .repartitionByRange(n_parts, "id")
        .localCheckpoint(eager=True)
    )

    def probe(tag, fn):
        best = None
        for _ in range(2):
            path = os.path.join(tempfile.gettempdir(), f"wp-{uuid.uuid4().hex[:8]}")
            t0 = time.perf_counter()
            fn(path)
            dt = time.perf_counter() - t0
            n_files = len(S.read_manifest(path)["files"])
            shutil.rmtree(path, ignore_errors=True)
            best = min(best, dt) if best else dt
        return {"path": tag, "sec": round(best, 3), "files": n_files,
                "mrows_per_sec": round(n_rows / best / 1e6, 2)}

    results = [
        probe("library_jvm_parquet", lambda p: S.overwrite_versioned(
            spark, df, p, stats_cols=("id",))),
        probe("datasource_writer", lambda p: df.write.format("snapshot")
              .option("path", p).option("stats_cols", "id").mode("overwrite").save()),
        probe("datasource_writer+blooms", lambda p: df.write.format("snapshot")
              .option("path", p).option("stats_cols", "id").option("bloom_cols", "h")
              .mode("overwrite").save()),
        probe("library+blooms", lambda p: S.overwrite_versioned(
            spark, df, p, stats_cols=("id",), bloom_cols=("h",))),
    ]
    print(json.dumps({"n_rows": n_rows, "n_parts": n_parts, "probes": results}))


if __name__ == "__main__":
    main()
