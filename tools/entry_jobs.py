"""Per-entry job-count map: run every corpus entry once (sequential,
warm session) and record (jobs, wall). Guide §1/§5: each Spark job
carries ~0.3-0.5 s of driver+scheduling overhead on this host, so
protocol entries' walls are mostly job count x overhead — this map
ranks where fewer actions buy the most.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/entry_jobs.py [prefix ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prefixes = sys.argv[1:] or None

    from stellar_etl_airflow_spark.queries import QUERIES
    from stellar_etl_airflow_spark.session import get_spark, warm_python_data_source

    spark = get_spark("entry-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def job_id() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    QUERIES["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm_python_data_source(spark)

    names = [n for n in sorted(QUERIES) if prefixes is None or any(n.startswith(p) for p in prefixes)]
    out = {}
    for n in names:
        j0, t0 = job_id(), time.perf_counter()
        try:
            QUERIES[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 - survey tool keeps going
            out[n] = {"error": str(exc)[:80]}
            continue
        out[n] = {"jobs": job_id() - j0, "wall": round(time.perf_counter() - t0, 2)}
    for n, d in sorted(out.items(), key=lambda kv: -kv[1].get("jobs", 0)):
        print(f"{d.get('jobs', '?'):>5} jobs {d.get('wall', 0):7.2f}s  {n}" if "jobs" in d else f"  ERR {n}: {d['error']}")
    with open("/tmp/entry_jobs.json", "w") as f:
        json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
