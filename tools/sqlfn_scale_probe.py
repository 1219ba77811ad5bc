"""Volume probes for the SQL-function surfaces (q69/q70 — VERDICT r12 ask #4).

q69 claim: SQL scalar UDFs (CREATE FUNCTION ... RETURN expr) are
Catalyst-INLINED, so the plan contract — no UDF/eval node, whole-stage
codegen over plain arithmetic — must hold at ANY data volume, and wall
must scale like the equivalent hand-inlined expression (it IS the same
plan). Probe: the q69 aggregate over K x sf0.1 lineitem, plan-audited
per K (fails loudly on any UDF marker), timed vs the hand-inlined twin.

q70 claim: SQL scripting's control flow (WHILE/IF parameter
derivation) is fixed driver-side cost — the script wall at volume is
the final SELECT's wall plus a constant. Probe: the q70 script over
K x sf0.1 orders vs its parameter-presubstituted SELECT.

Usage: python tools/sqlfn_scale_probe.py [K ...] (default 1 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from stellar_etl_airflow_spark.queries.base import dsum_sql, tables
from stellar_etl_airflow_spark.session import get_spark

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale-stress")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_UDF_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "ScalaUDF", "PythonUDF", "SQLFunction")


def _replicate(spark: SparkSession, table: str, id_col: str, k: int) -> str:
    out = os.path.join(ROOT, f"{table}-x{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    from probe_lib import k_replicas

    (df,) = tables(spark, SF_DIR, table)
    k_replicas(df, k, {id_col: 10**12}).write.mode("overwrite").parquet(out)
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def _ab_time(thunks: list, reps: int = 3) -> list[float]:
    """min-of-reps for each thunk, ALTERNATING a full cycle per rep
    after one discarded warmup cycle — back-to-back reps of one side
    right after a heavy build phase absorb all the GC/page-cache drift
    and fabricate a ratio (first cut of this probe read 2.85x for two
    plans that are identical warm)."""
    for t in thunks:
        t()  # warmup cycle
    walls = [[] for _ in thunks]
    for _ in range(reps):
        for i, t in enumerate(thunks):
            t0 = time.perf_counter()
            t()
            walls[i].append(time.perf_counter() - t0)
    return [round(min(w), 3) for w in walls]


def _no_udf(df) -> None:
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    phys = df._jdf.queryExecution().executedPlan().toString()
    for m in _UDF_MARKERS:
        assert m not in opt and m not in phys, f"plan contains {m}"


def probe_q69(spark: SparkSession, k: int) -> dict:
    path = _replicate(spark, "lineitem", "l_orderkey", k)
    spark.read.parquet(path).createOrReplaceTempView("li_k")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION p69_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION p69_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p69_disc_price(p, d) * (1 + t)"
    )
    via_fn = spark.sql(f"""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
           {dsum_sql('p69_disc_price(l_extendedprice, l_discount)')} AS sum_disc_price,
           {dsum_sql('p69_charge(l_extendedprice, l_discount, l_tax)')} AS sum_charge
    FROM li_k WHERE l_quantity < 24 GROUP BY l_returnflag, l_linestatus
    """)
    inline = spark.sql(f"""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge
    FROM li_k WHERE l_quantity < 24 GROUP BY l_returnflag, l_linestatus
    """)
    _no_udf(via_fn)  # the plan contract, audited AT THIS VOLUME
    a = sorted(map(tuple, via_fn.collect()))
    b = sorted(map(tuple, inline.collect()))
    assert a == b, "SQL-UDF result diverged from inlined twin"
    fn_sec, inline_sec = _ab_time([
        lambda: via_fn.write.format("noop").mode("overwrite").save(),
        lambda: inline.write.format("noop").mode("overwrite").save(),
    ])
    return {"probe": "q69_sql_udf", "k": k, "via_fn_sec": fn_sec, "inline_sec": inline_sec}


def probe_q70(spark: SparkSession, k: int) -> dict:
    path = _replicate(spark, "orders", "o_orderkey", k)
    spark.read.parquet(path).createOrReplaceTempView("ord_k")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    script = """
    BEGIN
      DECLARE n_buckets INT DEFAULT 1;
      DECLARE cutoff DOUBLE DEFAULT 100000.0;
      WHILE n_buckets < 100 DO
        SET n_buckets = n_buckets * 2;
      END WHILE;
      IF (SELECT max(o_totalprice) FROM ord_k) > 100000.0 THEN
        SET cutoff = 300000.0;
      END IF;
      SELECT o_orderstatus, CAST(o_orderkey % n_buckets AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM ord_k WHERE o_totalprice > cutoff
      GROUP BY o_orderstatus, o_orderkey % n_buckets;
    END
    """
    presub = """
    SELECT o_orderstatus, CAST(o_orderkey % 128 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM ord_k WHERE o_totalprice > 300000.0
    GROUP BY o_orderstatus, o_orderkey % 128
    """
    # scripts re-execute end to end per run (the IF's scalar subquery
    # included) — time the whole spark.sql() call, not a cached plan
    script_sec, presub_sec = _ab_time([
        lambda: spark.sql(script).write.format("noop").mode("overwrite").save(),
        lambda: spark.sql(presub).write.format("noop").mode("overwrite").save(),
    ])
    return {
        "probe": "q70_sql_script",
        "k": k,
        "script_sec": script_sec,
        "presub_select_sec": presub_sec,
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("sqlfn-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROOT, exist_ok=True)
    r69, r70 = {}, {}
    for k in ks:
        r69[k] = probe_q69(spark, k)
        print(json.dumps(r69[k]), flush=True)
        r70[k] = probe_q70(spark, k)
        print(json.dumps(r70[k]), flush=True)
    if len(ks) > 1:
        k0, k1 = ks[0], ks[-1]
        print(json.dumps({
            "summary": "volume ratios",
            "volume_ratio": k1 / k0,
            "q69_via_fn_wall_ratio": round(r69[k1]["via_fn_sec"] / r69[k0]["via_fn_sec"], 2),
            "q69_fn_over_inline_at_kmax": round(r69[k1]["via_fn_sec"] / r69[k1]["inline_sec"], 2),
            "q70_script_wall_ratio": round(r70[k1]["script_sec"] / r70[k0]["script_sec"], 2),
            "q70_script_minus_select_at_kmax": round(
                r70[k1]["script_sec"] - r70[k1]["presub_select_sec"], 3
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
