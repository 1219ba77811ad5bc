"""Volume probe for the VARIANT plane (q66/q68 — VERDICT r12 ask #4).

The 100 TB claim under test: semi-structured data should be parsed ONCE
at ingest and stored as Spark 4's binary VARIANT encoding (q68's shape);
every downstream query then pays typed ``variant_get`` access against
the stored encoding instead of re-parsing JSON text per query
(``get_json_object`` — the shape a naive pipeline keeps forever). This
probe measures BOTH read paths over the SAME logical rows at K=1 and
K=10 volume:

- ``variant``: stored-VARIANT parquet scanned with typed
  ``variant_get`` paths (nested field, array index, top-level string) +
  filter + aggregate — exactly q66/q68's access pattern;
- ``reparse``: the JSON documents stored as STRING parquet, same
  pipeline through ``get_json_object``/``json_tuple``-style extraction
  (one parse per path per row — the cost VARIANT ingest amortizes away).

Expected at scale: both scale ~linearly with K (zero shuffles before
the tiny aggregate), with the variant path cheaper per row; the RATIO
reparse/variant is the per-query dividend of parse-at-ingest, paid
back on every one of the N downstream queries that touch the column.
Storage is also reported (variant parquet vs json-string parquet) since
the encoding trades bytes for access speed.

Usage: python tools/variant_scale_probe.py [K ...] (default 1 10).
Prints one JSON line per (K, path) and a summary with ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from stellar_etl_airflow_spark.queries.base import tables
from stellar_etl_airflow_spark.session import get_spark

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale-stress")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark: SparkSession, k: int):
    """K-replicated q66 documents (probe_lib.k_replicas: distinct rows
    per replica, same shape/cardinality profile)."""
    from probe_lib import k_replicas

    (ev,) = tables(spark, SF_DIR, "events")
    out = k_replicas(
        ev.select("event_id", "event_type", "user_id", "props"),
        k,
        {"event_id": 10**12, "user_id": 10**9},
    )
    return out.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("type"),
                F.struct(F.col("user_id").alias("uid")).alias("who"),
                F.from_json(F.col("props"), "k long").alias("props"),
                F.array(F.col("user_id") % 3, F.col("user_id") % 5).alias("tags"),
            )
        ).alias("doc")
    )


def build(spark: SparkSession, k: int) -> tuple[str, str]:
    vpath = os.path.join(ROOT, f"variant-{k}")
    jpath = os.path.join(ROOT, f"jsonstr-{k}")
    if not os.path.exists(os.path.join(vpath, "_DONE")):
        shutil.rmtree(vpath, ignore_errors=True)
        docs = _docs(spark, k)
        docs.select(F.parse_json(F.col("doc")).alias("v")).write.mode("overwrite").parquet(vpath)
        open(os.path.join(vpath, "_DONE"), "w").close()
    if not os.path.exists(os.path.join(jpath, "_DONE")):
        shutil.rmtree(jpath, ignore_errors=True)
        _docs(spark, k).write.mode("overwrite").parquet(jpath)
        open(os.path.join(jpath, "_DONE"), "w").close()
    return vpath, jpath


def q_variant(spark: SparkSession, path: str):
    v = spark.read.parquet(path)
    flat = v.select(
        F.variant_get(F.col("v"), "$.who.uid", "long").alias("uid"),
        F.variant_get(F.col("v"), "$.props.k", "long").alias("k"),
        F.variant_get(F.col("v"), "$.tags[1]", "long").alias("tag1"),
        F.variant_get(F.col("v"), "$.type", "string").alias("etype"),
    )
    return (
        flat.where(F.col("etype") == "purchase")
        .groupBy((F.col("k") % 10).alias("k_mod10"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("uid").alias("s"), F.sum("tag1").alias("t"))
    )


def q_reparse(spark: SparkSession, path: str):
    j = spark.read.parquet(path)
    flat = j.select(
        F.get_json_object("doc", "$.who.uid").cast("long").alias("uid"),
        F.get_json_object("doc", "$.props.k").cast("long").alias("k"),
        F.get_json_object("doc", "$.tags[1]").cast("long").alias("tag1"),
        F.get_json_object("doc", "$.type").alias("etype"),
    )
    return (
        flat.where(F.col("etype") == "purchase")
        .groupBy((F.col("k") % 10).alias("k_mod10"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("uid").alias("s"), F.sum("tag1").alias("t"))
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for dp, _dn, fns in os.walk(path):
        for fn in fns:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dp, fn))
    return total


def time_q(df, reps: int = 3) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 3)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("variant-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROOT, exist_ok=True)
    results: dict[int, dict] = {}
    for k in ks:
        vpath, jpath = build(spark, k)
        # correctness cross-check before timing: both paths must agree
        a = {r["k_mod10"]: (r["n"], r["s"], r["t"]) for r in q_variant(spark, vpath).collect()}
        b = {r["k_mod10"]: (r["n"], r["s"], r["t"]) for r in q_reparse(spark, jpath).collect()}
        assert a == b, f"variant vs reparse disagree at K={k}"
        rec = {
            "k": k,
            "variant_sec": time_q(q_variant(spark, vpath)),
            "reparse_sec": time_q(q_reparse(spark, jpath)),
            "variant_bytes": _dir_bytes(vpath),
            "json_bytes": _dir_bytes(jpath),
        }
        rec["reparse_over_variant"] = round(rec["reparse_sec"] / rec["variant_sec"], 2)
        results[k] = rec
        print(json.dumps(rec), flush=True)
    if len(ks) > 1:
        k0, k1 = ks[0], ks[-1]
        print(json.dumps({
            "summary": "wall ratios vs volume ratio",
            "volume_ratio": k1 / k0,
            "variant_wall_ratio": round(results[k1]["variant_sec"] / results[k0]["variant_sec"], 2),
            "reparse_wall_ratio": round(results[k1]["reparse_sec"] / results[k0]["reparse_sec"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
