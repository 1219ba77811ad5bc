"""Reproduce the cross-entry CPU-burst anomaly (OPTIMIZATION_r13
post-close section) under JVM diagnostics, and A/B the code-cache
hypothesis: 154 distinct queries x whole-stage-codegen classes x reps
overflow the default 240 MB ReservedCodeCacheSize, and the resulting
sweep/recompile storm burns hundreds of CPU-seconds mid-pooled-pass.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/burst_probe.py default|bigcache [reps] [par]

Runs the FULL corpus pooled (bench methodology) ``reps`` times in one
session with `-Xlog:gc+codecache:file=...` and `-XX:+CITime` (JIT CPU
accounting printed at JVM exit on stderr), printing per-rep wall + tree
CPU. Compare rep-to-rep CPU inflation across the two modes.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pooled_bisect import tree_cpu  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    par = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stellar_etl_airflow_spark.queries import QUERIES
    from stellar_etl_airflow_spark.session import get_spark, warm_python_data_source

    opts = f"-Xlog:codecache=info:file=/tmp/codecache-{mode}.log:time,uptime -XX:+CITime"
    if mode == "bigcache":
        opts = "-XX:ReservedCodeCacheSize=1g " + opts
    extra = {"spark.driver.extraJavaOptions": opts}
    if mode == "codegen":
        # the candidate burst fix: the JVM-global generated-class cache
        # holds 100 entries by default; 154 queries x several WSCG
        # fragments each thrash it, so every pass re-Janino-compiles and
        # re-JITs the whole corpus's generated code
        extra["spark.sql.codegen.cache.maxEntries"] = "10000"
    spark = get_spark("burst-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _noop_batches(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    from stellar_etl_airflow_spark.session import default_parallelism

    (
        spark.range(0, default_parallelism() * 2, 1, default_parallelism() * 2)
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    warm_python_data_source(spark)

    names = sorted(QUERIES)

    def run(name: str):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return name, round(time.perf_counter() - t0, 2)

    for rep in range(reps):
        c0, t0 = tree_cpu(), time.perf_counter()
        with ThreadPoolExecutor(max_workers=par) as pool:
            res = dict(pool.map(run, names))
        wall = time.perf_counter() - t0
        slow = sorted(res.items(), key=lambda kv: -kv[1])[:6]
        print(
            f"{mode} rep{rep}: wall={wall:.1f}s cpu={tree_cpu() - c0:.0f}s "
            f"top={[f'{n}:{w}' for n, w in slow]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
