"""BASELINE-faithful end-to-end batch job for benchmarking.

The reference's operational contract is per-10-minute-batch wall clock,
not per-query latency: 300 s for the stellar-etl export task and 400 s
for the GCS->BigQuery del/ins + MERGE load
(BASELINE.md; dags/history_tables_dag.py / state_tables_dag.py task
timeouts). This module chains the engine's counterparts of one complete
batch so the bench can print ONE number directly comparable to those
budgets:

  plan window (operators/batch.py)
    -> NDJSON del/ins ingest of ledgers + account changes
       (operators/ingest.py — the 400 s load task's first half)
    -> apply_changes MVCC state merge (operators/merge.py — its second
       half, build_apply_gcs_changes_to_bq_task.py:116-149)
    -> v_accounts_current dedup view (views/currentstate.py)
    -> ordered Avro export slice (sinks/exports.py — the public-bucket
       Avro job, SLA 12600 s)

Input volume comes from the shared testdata (TESTDATA.md): the orders
table is mapped deterministically onto the reference's account-change
shape (~150 k changes at sf0.1 — the same order of magnitude as a real
10-minute ledger window), and a 120-ledger (10 min x 5 s close cadence)
ledgers table is synthesized for the join side. The NDJSON staging step
is PREPARATION (the reference's export task writes it; we only time our
own engine reading it) — ``prepare`` is untimed, ``run`` is timed.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.batch import BatchWindow, plan_batch
from .operators.ingest import Warehouse, ingest_batch
from .operators.merge import apply_changes
from .sinks import exports
from .sinks import snapshots as S
from .views import currentstate as CS

from pyspark.sql import types as T

ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("account_id", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("last_modified_ledger", T.LongType()),
        T.StructField("ledger_entry_change", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

LEDGERS_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.LongType()),
        T.StructField("ledger_hash", T.StringType()),
        T.StructField("closed_at", T.TimestampType()),
        T.StructField("transaction_count", T.LongType()),
    ]
)

RUN_START = datetime(2024, 1, 1, 10, 0)
RUN_END = datetime(2024, 1, 1, 10, 10)


def plan_window() -> BatchWindow:
    return plan_batch("e2e_bench", RUN_START, RUN_END)


def prepare(spark: SparkSession, sf_dir: str, workdir: str) -> tuple[str, str]:
    """UNTIMED staging: derive the batch's NDJSON landing files from the
    shared orders table (deterministic column mapping, no synthesis of
    new data). Returns (ledgers_src, accounts_src) directories."""
    w = plan_window()
    n_ledgers = w.end_ledger - w.start_ledger + 1
    led_src = os.path.join(workdir, f"{w.start_ledger}-{w.end_ledger}-ledgers")
    acc_src = os.path.join(workdir, f"{w.start_ledger}-{w.end_ledger}-accounts")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    changes = orders.select(
        F.col("o_custkey").cast("string").alias("account_id"),
        F.col("o_totalprice").alias("balance"),
        F.col("o_orderkey").alias("sequence_number"),
        (F.lit(w.start_ledger) + F.pmod("o_orderkey", F.lit(n_ledgers))).alias(
            "last_modified_ledger"
        ),
        F.pmod("o_orderkey", F.lit(3)).cast("long").alias("ledger_entry_change"),
        (F.pmod("o_orderkey", F.lit(97)) == 0).alias("deleted"),
    )
    changes.write.mode("overwrite").json(acc_src)

    ledgers = spark.range(w.start_ledger, w.end_ledger + 1).select(
        F.col("id").alias("sequence"),
        F.sha1(F.col("id").cast("string")).alias("ledger_hash"),
        (
            F.lit(w.interval_start)
            + F.make_interval(secs=(F.col("id") - w.start_ledger) * F.lit(5.0))
        ).alias("closed_at"),
        F.pmod("id", F.lit(1000)).alias("transaction_count"),
    )
    ledgers.write.mode("overwrite").json(led_src)
    return led_src, acc_src


def run(
    spark: SparkSession, led_src: str, acc_src: str, workdir: str, n_buckets: int = 32
) -> dict:
    """TIMED: one complete batch through the engine — del/ins ingest,
    MVCC state merge, current-state view, Avro export. Returns stage
    row counts for assertions plus per-stage wall times (``stages``,
    r8 VERDICT r7 ask #8 — a regression in the e2e number must name
    its stage); the caller times the whole call."""
    import time

    w = plan_window()
    wh = Warehouse(os.path.join(workdir, "wh"))
    stages: dict[str, float] = {}

    t0 = time.perf_counter()
    led_df = ingest_batch(
        spark, wh, "history_ledgers", led_src, LEDGERS_SCHEMA, w, cluster_fields=("sequence",)
    )
    acc_df = ingest_batch(spark, wh, "accounts", acc_src, ACCOUNTS_SCHEMA, w)
    stages["ingest_delins"] = round(time.perf_counter() - t0, 3)

    chg = acc_df.drop("batch_id", "batch_run_date", "batch_insert_ts")
    led = led_df.drop("batch_id", "batch_run_date", "batch_insert_ts")
    state_tbl = wh.path("accounts_state")
    t0 = time.perf_counter()
    version, touched = apply_changes(
        spark, chg, state_tbl, ("account_id",), n_buckets=n_buckets, txn_id=w.batch_id,
        stats_cols=("account_id", "last_modified_ledger"),
    )
    state_rows = S.read_snapshot(spark, state_tbl, version).count()
    stages["state_merge"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cur = CS.v_accounts_current(chg, led)
    dest = exports.avro_export_dir(os.path.join(workdir, "avro"), "accounts", w.interval_end)
    fmt = exports.export_slice(
        cur,
        ["account_id", "balance", "sequence_number", "last_modified_ledger", "deleted", "closed_at"],
        "closed_at",
        w.interval_start,
        w.interval_end,
        dest,
    )
    export_rows = exports.read_export(spark, fmt, dest).count()
    stages["view_export"] = round(time.perf_counter() - t0, 3)
    return {
        "state_rows": state_rows,
        "export_rows": export_rows,
        "export_format": fmt,
        "touched_buckets": len(touched),
        "version": version,
        "stages": stages,
    }
