"""Benchmark harness: runs the oracle-checked query corpus against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints TWO JSON lines — a per-query timing map first, then the compact
headline metric LAST (the driver keeps the last complete line):

  {"metric": "per_query_sec", "queries": {"q01_...": sec, ...}, "sf": 0.1}
  {"metric": "corpus_wall_sec", "value": N, "unit": "sec", "sf": 0.1}

Each query is executed to completion (count + a cheap checksum collect is
avoided — we use ``df.write.format("noop")`` so results are fully
materialized without driver transfer, matching how a sink would consume
them at scale).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stellar_etl_airflow_spark.queries import QUERIES  # noqa: E402
from stellar_etl_airflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("stellar-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # warm the JVM/codegen once so per-query numbers reflect steady state
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    total_t0 = time.perf_counter()
    for name, spec in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - total_t0, 3)

    # Two lines, detail first: the driver captures a bounded tail of stdout
    # and keeps the LAST complete JSON line, so the compact headline metric
    # must come last (a single giant line gets head-truncated and parses as
    # nothing).
    print(json.dumps({"metric": "per_query_sec", "queries": timings, "sf": sf}))
    print(json.dumps({"metric": "corpus_wall_sec", "value": total, "unit": "sec", "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
