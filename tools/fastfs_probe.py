"""A/B probe for the fastlocalfs shim: run entries solo (bench
methodology) with and without the nio local filesystem, recording wall,
process-tree CPU and the HOST FORK COUNT (/proc/stat `processes` --
every chmod/readlink exec is a fork) per rep.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/fastfs_probe.py fast|plain s08_stream_crash_resume[,more] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pooled_bisect import tree_cpu  # noqa: E402


def forks() -> int:
    with open("/proc/stat") as fh:
        for line in fh:
            if line.startswith("processes "):
                return int(line.split()[1])
    return -1


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stellar_etl_airflow_spark.queries import QUERIES
    from stellar_etl_airflow_spark.session import get_spark

    extra = {}
    if mode == "fast":
        jar = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "stellar_etl_airflow_spark", "jars", "fastlocalfs.jar",
        )
        extra = {
            "spark.driver.extraClassPath": jar,
            "spark.hadoop.fs.file.impl": "fastlocalfs.FastLocalFileSystem",
            "spark.hadoop.fs.AbstractFileSystem.file.impl": "fastlocalfs.FastLocalFs",
        }
    spark = get_spark("fastfs-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _noop_batches(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    from stellar_etl_airflow_spark.session import default_parallelism, warm_python_data_source

    (
        spark.range(0, default_parallelism() * 2, 1, default_parallelism() * 2)
        .mapInPandas(_noop_batches, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    warm_python_data_source(spark)

    for name in names:
        spec = QUERIES[name]
        walls, cpus, fks = [], [], []
        for _ in range(reps):
            c0, f0, t0 = tree_cpu(), forks(), time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            fks.append(forks() - f0)
            cpus.append(round(tree_cpu() - c0, 1))
        print(
            f"{mode} {name}: wall_min={min(walls)} walls={walls} "
            f"cpu={cpus} forks={fks}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
