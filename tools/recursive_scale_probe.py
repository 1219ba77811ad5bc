"""Volume probe for the recursive-CTE shape (q65 — VERDICT r11 ask #4).

q65's synthetic forest (parent = custkey DIV 10) cannot ride
tools/scale_stress.py's id-offset replication: an offset key's parent
(``(key + r*10^10) DIV 10``) lands outside its replica, so replicas
would add rows the walk never reaches and the measured work would not
scale. This probe builds the SAME forest shape directly at N, 10N,
100N keys (0..N-1, roots < 10), so 10x keys = 10x rows in every
recursion level plus ONE extra level (depth = digits-1 — the claim
under test is that depth grows log10(N) while each iteration is a
key-partitioned hash join over the level frontier, so wall grows
~linearly with N, never with N^2).

The recursion re-reads the base relation's ``>= 10`` filter each
iteration; that is the cost VERDICT r11 asked to measure. Base tables
are materialized as parquet (one per N, reused) so every run scans
files like the corpus entry, not an in-memory localRelation.

Usage: python tools/recursive_scale_probe.py [N ...]  (default:
100_000 1_000_000 10_000_000). Prints one JSON line per N and a
summary with ratios normalized to the first N.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from stellar_etl_airflow_spark.session import get_spark

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale-stress")


def build(spark: SparkSession, n: int) -> str:
    out = os.path.join(ROOT, f"forest-{n}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    # same columns q65 touches; acctbal deterministic so reruns agree
    df = (
        spark.range(0, n, 1, 32)
        .select(
            F.col("id").alias("c_custkey"),
            (F.pmod(F.col("id") * 7919, F.lit(100000)) / 100.0).alias("c_acctbal"),
        )
    )
    df.write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def walk(spark: SparkSession, path: str, n: int) -> tuple[float, int]:
    # 100 TB finding (r12): Spark 4 guards recursive CTEs with
    # spark.sql.cteRecursionRowLimit = 1e6 TOTAL rows across all levels
    # (and cteRecursionLevelLimit = 100 levels) — any production-size
    # hierarchy walk must raise the row limit or it fails with
    # RECURSION_ROW_LIMIT_EXCEEDED once the walked relation passes 1M
    # rows. Depth is never the binding limit for the DIV-10 forest
    # (log10(N) levels); total rows are.
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(max(2 * n, 1_000_000)))
    spark.read.parquet(os.path.join(path, "customer.parquet")).createOrReplaceTempView(
        f"forest_{n}"
    )
    t0 = time.perf_counter()
    out = spark.sql(f"""
    WITH RECURSIVE walk(custkey, root, depth, acctbal) AS (
      SELECT c_custkey, c_custkey, 0, c_acctbal
      FROM forest_{n} WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, w.root, w.depth + 1, c.c_acctbal
      FROM forest_{n} c JOIN walk w ON c.c_custkey DIV 10 = w.custkey
      WHERE c.c_custkey >= 10
    )
    SELECT depth, root % 4 AS root_bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
    FROM walk GROUP BY depth, root % 4
    """)
    rows = out.collect()
    wall = time.perf_counter() - t0
    # every key lands exactly once across the depth levels: the walk
    # visited the whole forest, so the wall measured the full volume
    visited = sum(r["n_customers"] for r in rows)
    assert visited == n, f"walk visited {visited} of {n} keys"
    max_depth = max(r["depth"] for r in rows)
    return round(wall, 2), max_depth


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2")))
    spark = get_spark("recursive-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[int, tuple[float, int]] = {}
    for n in ns:
        path = build(spark, n)
        best, depth = None, None
        for _ in range(reps):
            wall, depth = walk(spark, path, n)
            best = wall if best is None else min(best, wall)
        results[n] = (best, depth)
        print(json.dumps({"n": n, "sec": best, "max_depth": depth, "reps": reps}), flush=True)
    base = ns[0]
    print(
        json.dumps(
            {
                "metric": "recursive_scale",
                "base_n": base,
                "entries": {
                    str(n): {
                        "sec": s,
                        "max_depth": d,
                        "ratio": round(s / max(results[base][0], 1e-9), 2),
                    }
                    for n, (s, d) in results.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
