"""The bench harness runs corpus queries on a thread pool (bench.py,
SPARK_GRAFT_BENCH_PAR) — pin that concurrent execution over one shared
SparkSession stays correct: temp-view re-registration races, streaming
memory sinks, localCheckpoints, and driver-side scoring must all be
thread-independent. A representative slice (relational + checkpointing
dedup + Arrow scorer + streaming) runs twice concurrently and must match
its sequential answer exactly."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from stellar_etl_airflow_spark.queries import QUERIES

from .conftest import SF_SMOKE

NAMES = [
    "q01_pricing_summary",
    "q16_distinct_groupall",
    "t01_exact_dedup",
    "t05_simhash_neardup",
    "t06_embedding_topk",
    "s02_stream_dedup",
]


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_concurrent_corpus_execution_matches_sequential(spark):
    expected = {n: _rows(QUERIES[n].fn(spark, SF_SMOKE)) for n in NAMES}

    def run(name):
        return name, _rows(QUERIES[name].fn(spark, SF_SMOKE))

    # two interleaved copies of each query on 6 threads
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(run, NAMES + list(reversed(NAMES))))
    for name, rows in results:
        assert rows == expected[name], f"{name} diverged under concurrency"
