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

Queries overlap on a thread pool ($SPARK_GRAFT_BENCH_PAR slots, default
8; set 1 for sequential): most corpus entries are scheduling-latency
bound, not compute bound, so overlapping independent read-only dataflows
is how the corpus extracts throughput from the cores — measured ~2x wall
vs sequential at sf0.1. Per-query seconds are wall times under that
concurrency (they include cross-query contention and sum to more than
corpus_wall_sec; the headline is the wall clock).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stellar_etl_airflow_spark.queries import QUERIES  # noqa: E402
from stellar_etl_airflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    par = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PAR", "8")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("stellar-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once so per-query numbers reflect steady state
    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run(item: tuple) -> tuple[str, float]:
        name, spec = item
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return name, round(time.perf_counter() - t0, 3)

    ordered = sorted(QUERIES.items())
    if par > 1:
        # longest-first keeps the big iterative jobs (components, pipeline,
        # LSH) from landing last and serializing the tail
        heavy = [
            "t20_training_pipeline", "t17_neardup_components", "t14_jaccard_dfcapped",
            "t02_ngram_jaccard_pairs", "t03_minhash_lsh_pairs", "s01_stream_tumbling",
            "t05_simhash_neardup", "t06_embedding_topk", "t13_multimodal_meta",
        ]
        ordered = [(n, QUERIES[n]) for n in heavy if n in QUERIES]
        ordered += [(n, s) for n, s in sorted(QUERIES.items()) if n not in set(heavy)]

    total_t0 = time.perf_counter()
    if par == 1:
        timings = dict(map(run, ordered))
    else:
        with ThreadPoolExecutor(max_workers=par) as pool:
            timings = dict(pool.map(run, ordered))
    total = round(time.perf_counter() - total_t0, 3)
    timings = {n: timings[n] for n in sorted(timings)}

    # Two lines, detail first: the driver captures a bounded tail of stdout
    # and keeps the LAST complete JSON line, so the compact headline metric
    # must come last (a single giant line gets head-truncated and parses as
    # nothing).
    print(json.dumps({"metric": "per_query_sec", "queries": timings, "sf": sf}))
    print(json.dumps({"metric": "corpus_wall_sec", "value": total, "unit": "sec", "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
