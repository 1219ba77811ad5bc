"""End-to-end batch lifecycle (SURVEY §3.1/§3.3): plan the window, ingest
history + state NDJSON through the idempotent del/ins path, build the
current-state view, run a mart through the model runner, export a public
slice — one pipeline, asserting at each seam."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.models.runner import ModelRegistry
from stellar_etl_airflow_spark.operators.batch import plan_batch
from stellar_etl_airflow_spark.operators.ingest import Warehouse, ingest_batch, read_table
from stellar_etl_airflow_spark.sinks import exports
from stellar_etl_airflow_spark.views import currentstate as CS

from . import fixtures as FX


def test_full_batch_lifecycle(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))

    # 1. plan the 10-minute window
    w = plan_batch("sched_1", datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 10))
    assert w.start_ledger <= w.end_ledger

    # 2. extract landed as NDJSON (exporter contract): ledgers + accounts
    led_src = FX.write_ndjson(
        str(tmp_path / "in" / f"{w.start_ledger}-{w.end_ledger}-ledgers.txt"), FX.ledger_rows()
    )
    acc_src = FX.write_ndjson(
        str(tmp_path / "in" / f"{w.start_ledger}-{w.end_ledger}-accounts.txt"), FX.account_change_rows()
    )

    # 3. idempotent del/ins ingest
    ingest_batch(spark, wh, "history_ledgers", led_src, FX.LEDGERS_SCHEMA, w, cluster_fields=("sequence",))
    ingest_batch(spark, wh, "accounts", acc_src, FX.ACCOUNTS_SCHEMA, w)
    # replay the batch — still idempotent end-to-end
    ingest_batch(spark, wh, "accounts", acc_src, FX.ACCOUNTS_SCHEMA, w)
    accounts = read_table(spark, wh, "accounts")
    ledgers = read_table(spark, wh, "history_ledgers")
    assert accounts.count() == 6 and ledgers.count() == 12

    # 3b. additive-MoR ingest counters (r11, VERDICT r10 ask #5): the
    # replayed accounts batch must NOT double-count (txn ledger), while
    # the lineage table records every run including the replay
    from stellar_etl_airflow_spark.operators.ingest import (
        fold_ingest_counters,
        read_ingest_counters,
    )

    counters = {
        r["table_name"]: (r["n_batches"], r["n_rows"])
        for r in read_ingest_counters(spark, wh).collect()
    }
    assert counters == {"history_ledgers": (1, 12), "accounts": (1, 6)}
    lineage = spark.read.parquet(wh.meta_path())
    assert lineage.where(F.col("table_name") == "accounts").count() == 2
    # maintenance fold: one row per table, same totals after
    _, n = fold_ingest_counters(spark, wh)
    assert n == 2
    counters_folded = {
        r["table_name"]: (r["n_batches"], r["n_rows"])
        for r in read_ingest_counters(spark, wh).collect()
    }
    assert counters_folded == counters

    # 4. current-state view over the change log
    cur = CS.v_accounts_current(accounts.drop("batch_id", "batch_run_date", "batch_insert_ts"), ledgers)
    assert {r["account_id"]: r["balance"] for r in cur.collect()} == {"A": 25.0, "B": 0.0, "C": 7.5}

    # 4b. materialized state table through THE default apply-changes path
    # (scoped + MVCC merge, bucket layout pinned in table props) — the
    # reference's MERGE step (build_apply_gcs_changes_to_bq_task.py:116-149)
    from stellar_etl_airflow_spark.operators.merge import apply_changes, load_table_props
    from stellar_etl_airflow_spark.sinks import snapshots as S

    state_tbl = wh.path("accounts_state")
    chg = accounts.drop("batch_id", "batch_run_date", "batch_insert_ts")
    v1, touched1 = apply_changes(spark, chg, state_tbl, ("account_id",), n_buckets=8)
    assert load_table_props(state_tbl)["n_buckets"] == 8
    state = {
        r["account_id"]: r["balance"]
        for r in S.read_snapshot(spark, state_tbl, v1).collect()
    }
    # B's latest change is its deletion marker -> MERGE deletes the row
    # (the view keeps it flagged; the state table drops it)
    assert state == {"A": 25.0, "C": 7.5}

    # second batch: an update for A only — rewrite must stay scoped to A's
    # bucket, and n_buckets comes from the pinned props (arg ignored)
    chg2 = spark.createDataFrame(
        [("A", 30.0, 4, 110, 0, False)],
        chg.schema,
    )
    v2, touched2 = apply_changes(spark, chg2, state_tbl, ("account_id",), n_buckets=999)
    assert v2 == v1 + 1 and len(touched2) == 1
    state2 = {
        r["account_id"]: r["balance"]
        for r in S.read_snapshot(spark, state_tbl).collect()
    }
    assert state2 == {"A": 30.0, "C": 7.5}
    # MVCC: the pre-batch version is still exactly readable (time travel)
    assert {
        r["account_id"]: r["balance"]
        for r in S.read_snapshot(spark, state_tbl, v1).collect()
    } == {"A": 25.0, "C": 7.5}

    # 5. mart via the model runner (tag closure)
    reg = ModelRegistry()

    @reg.model("accounts_current", tags=("current_state",))
    def accounts_current(ctx):
        return cur

    @reg.model("account_stats", tags=("marts",), deps=("accounts_current",))
    def account_stats(ctx):
        return ctx.ref("accounts_current").agg(
            F.count(F.lit(1)).alias("n_accounts"),
            F.sum(F.col("balance").cast("decimal(38,6)")).cast("double").alias("total_balance"),
        )

    out = reg.run(spark, "+tag:marts")
    stats = out["account_stats"].collect()[0]
    assert stats["n_accounts"] == 3 and stats["total_balance"] == 32.5

    # 6. public export: hourly slice of the view, reference directory scheme
    dest = exports.avro_export_dir(str(tmp_path / "avro"), "accounts", datetime(2024, 1, 1, 11))
    fmt = exports.export_slice(
        cur, ["account_id", "balance", "closed_at"], "closed_at",
        datetime(2024, 1, 1), datetime(2024, 1, 2), dest,
    )
    assert exports.read_export(spark, fmt, dest).count() == 3


def test_e2e_bench_job(spark, tmp_path):
    """The bench's BASELINE-comparable batch job (stellar_etl_airflow_spark/e2e.py):
    orders-derived NDJSON -> del/ins -> apply_changes -> current view ->
    Avro export, asserting the stage invariants at sf0.001."""
    import os

    from stellar_etl_airflow_spark import e2e

    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    led_src, acc_src = e2e.prepare(spark, sf_dir, str(tmp_path))
    m = e2e.run(spark, led_src, acc_src, str(tmp_path))
    assert m["export_format"] in ("avro", "parquet")
    # the export keeps deletion-flagged latest rows (view semantics);
    # the state table drops them (MERGE semantics)
    assert m["export_rows"] >= m["state_rows"] > 0
    # the view keeps dense_rank ties (two changes with the same
    # (ledger, entry_change) both rank 1 — reference semantics), so the
    # export has AT LEAST one row per account; the MERGE state table has
    # AT MOST one (ties collapsed, deletions dropped)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_accounts = orders.select("o_custkey").distinct().count()
    assert m["export_rows"] >= n_accounts >= m["state_rows"]
