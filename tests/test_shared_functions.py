"""Shared scalar SQL UDFs (functions/sharedsql.py, VERDICT r12 ask #5).

Two contracts:
1. semantics — each helper computes exactly the reference expression
   (v_liquidity_pool_trade_volume.sql:69-86), including the NULL-flag
   CASE branch behavior, from both the DataFrame API and SQL text;
2. plan — Catalyst INLINES the SQL function bodies: no UDF/eval node of
   any kind appears in the optimized or physical plan of a view that
   uses them, so codegen/pushdown see plain arithmetic (the q69
   plan-contract generalized to the engine's own views).
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.functions import sharedsql as SX
from stellar_etl_airflow_spark.views import marts

from .conftest import SF_SMOKE
from .test_marts_full import _pools_current, _prices_usd, _prices_xlm

_UDF_NODES = ("BatchEvalPython", "ArrowEvalPython", "ScalaUDF", "PythonUDF", "SQLFunction")


def _no_udf_nodes(df):
    phys = df._jdf.queryExecution().executedPlan().toString()
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    for marker in _UDF_NODES:
        assert marker not in phys, marker
        assert marker not in opt, marker


def _trades(spark):
    return spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 12), "P1", None, None, "native", 10.0,
             "bA", "USD", "I1", "credit_alphanum4", 80.0, 1, 2, 30),
        ],
        "ledger_closed_at timestamp, selling_liquidity_pool_id string, "
        "selling_asset_code string, selling_asset_issuer string, selling_asset_type string, "
        "selling_amount double, buying_account_address string, buying_asset_code string, "
        "buying_asset_issuer string, buying_asset_type string, buying_amount double, "
        "price_n long, price_d long, liquidity_pool_fee long",
    )


def test_helpers_match_reference_arithmetic(spark):
    SX.register_shared_functions(spark)
    row = (
        spark.range(1)
        .select(
            SX.fee_multiplier(F.lit(30)).alias("mult"),
            SX.gross_usd(F.lit(True), F.lit(80.0), F.lit(8.0), F.lit(0.1)).alias("g_native"),
            SX.gross_usd(F.lit(False), F.lit(80.0), F.lit(8.0), F.lit(0.1)).alias("g_other"),
            SX.gross_usd(F.lit(False), F.lit(80.0), F.lit(None).cast("double"), F.lit(0.1)).alias("g_nullprice"),
            SX.fee_earned(F.lit(64.0), F.lit(1.003)).alias("fee"),
            SX.trade_amount(F.lit(64.0), F.lit(1.003)).alias("amt"),
            SX.directed_price(F.lit(1), F.lit(2), F.lit(True)).alias("inv"),
            SX.directed_price(F.lit(1), F.lit(2), F.lit(False)).alias("fwd"),
            SX.directed_price(F.lit(1), F.lit(2), F.lit(None).cast("boolean")).alias("nullflag"),
            SX.price_ratio(F.lit(1), F.lit(2)).alias("ratio"),
        )
        .collect()[0]
    )
    assert row["mult"] == 1 + 30 / 10000
    assert row["g_native"] == 80.0 * 0.1
    assert row["g_other"] == 80.0 * 8.0 * 0.1
    assert row["g_nullprice"] == 0.0  # COALESCE'd like the reference
    assert row["fee"] == 64.0 - 64.0 / 1.003 and row["amt"] == 64.0 / 1.003
    assert row["inv"] == 2.0 and row["fwd"] == 0.5
    assert row["nullflag"] == 0.5  # NULL flag -> ELSE branch (reference CASE)
    assert row["ratio"] == 0.5


def test_functions_callable_from_sql_text(spark):
    """The same definitions serve spark.sql strings — one source of
    truth for DataFrame views AND any translated reference SQL."""
    SX.register_shared_functions(spark)
    got = spark.sql(
        "SELECT sx_trade_amount(sx_gross_usd(false, 80.0, 8.0, 0.1), "
        "sx_fee_multiplier(30)) AS amt"
    ).collect()[0]["amt"]
    assert math.isclose(got, (80.0 * 8.0 * 0.1) / 1.003, rel_tol=0, abs_tol=1e-12)


def test_trade_volume_view_unchanged_and_inlined(spark):
    """The refactored mart computes the exact hand-checked numbers AND
    its plan carries no UDF node (Catalyst inlined every SQL function)."""
    out_df = marts.liquidity_pool_trade_volume(
        _trades(spark), _pools_current(spark), _prices_xlm(spark), _prices_usd(spark)
    )
    _no_udf_nodes(out_df)
    r = out_df.collect()[0]
    gross = 80.0 * 8.0 * 0.1
    assert abs(r["trade_amount"] - gross / 1.003) < 1e-9
    assert abs(r["fee_earned"] - (gross - gross / 1.003)) < 1e-9
    # NULL selling code (native): both direction CASEs take ELSE
    assert r["quote_price"] == 0.5 and r["base_price"] == 2.0


def test_q07_q42_entries_inlined(spark):
    """The corpus entries that now use the shared fee math keep
    UDF-free plans (their oracle greens prove values; this pins the
    plan half so the refactor can't regress to an eval node)."""
    from stellar_etl_airflow_spark.queries import QUERIES

    for name in ("q07_asof_price_join", "q42_bucketed_range_join"):
        _no_udf_nodes(QUERIES[name].fn(spark, SF_SMOKE))


def test_ohlc_uses_shared_ratio(spark):
    df = marts.ohlc(
        spark.createDataFrame(
            [(datetime(2024, 1, 1, 5), "A", "B", 3, 4, 10.0)],
            "ledger_closed_at timestamp, selling_asset_id string, buying_asset_id string, "
            "price_n long, price_d long, selling_amount double",
        )
    )
    _no_udf_nodes(df)
    assert df.collect()[0]["open"] == 0.75
