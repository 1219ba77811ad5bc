"""Solo per-entry wall + tree-CPU probe for controlled A/B runs.

Usage: python tools/solo_ab_probe.py s14_stream_incremental_dedup,q61_zorder_optimize [reps]

Runs each named entry solo (bench methodology: fn() + noop write, warm
session, q01 + pandas + DS warmups first), ``reps`` times, and prints
per-entry wall min/all plus process-tree CPU per rep. Intended to run
identically in two checkouts (HEAD vs a prior-commit worktree),
interleaved, so host drift is attributable (guide §1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pooled_bisect import tree_cpu  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from stellar_etl_airflow_spark.queries import QUERIES
    from stellar_etl_airflow_spark.session import get_spark, warm_python_data_source

    spark = get_spark("solo-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _noop_batches(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    (
        spark.range(0, 64, 1, 64)
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    warm_python_data_source(spark)

    for name in names:
        walls, cpus = [], []
        for _ in range(reps):
            c0, t0 = tree_cpu(), time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            cpus.append(tree_cpu() - c0)
        print(
            f"{name}: wall_min={min(walls):.2f} walls={[round(w, 2) for w in walls]} "
            f"cpu={[round(c, 1) for c in cpus]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
