"""Full-view ports: v_liquidity_pool_value (TVL), v_relevant_asset_trades,
v_liquidity_pool_trade_volume — reference-shaped fixtures with hand-computed
expectations."""

from __future__ import annotations

from datetime import datetime

from stellar_etl_airflow_spark.views import marts


def _pools_current(spark):
    return spark.createDataFrame(
        [
            # pool P1: native/USD, live
            ("P1", "native", None, None, "credit_alphanum4", "USD", "I1", 100.0, 200.0, False, "XLM:USD"),
            # pool P2: EUR/USD, live
            ("P2", "credit_alphanum4", "EUR", "I2", "credit_alphanum4", "USD", "I1", 50.0, 60.0, False, "EUR:USD"),
            # pool P3 deleted -> excluded
            ("P3", "native", None, None, "credit_alphanum4", "USD", "I1", 1.0, 1.0, True, "XLM:USD"),
        ],
        "liquidity_pool_id string, asset_a_type string, asset_a_code string, asset_a_issuer string, "
        "asset_b_type string, asset_b_code string, asset_b_issuer string, "
        "asset_a_amount double, asset_b_amount double, deleted boolean, asset_pair string",
    )


def _prices_xlm(spark):
    return spark.createDataFrame(
        [
            ("USD", "I1", 8.0, datetime(2024, 1, 1)),
            ("USD", "I1", 10.0, datetime(2024, 1, 2)),  # latest
            ("EUR", "I2", 11.0, datetime(2024, 1, 1)),
        ],
        "asset_code string, asset_issuer string, price_in_xlm double, last_updated_ts timestamp",
    )


def _prices_usd(spark):
    return spark.createDataFrame(
        [("XLM", 0.1, datetime(2024, 1, 1)), ("XLM", 0.2, datetime(2024, 1, 2))],
        "asset_id string, price_in_usd double, last_updated_ts timestamp",
    )


def test_liquidity_pool_value(spark):
    out = {r["liquidity_pool_id"]: r for r in marts.liquidity_pool_value(
        _pools_current(spark), _prices_xlm(spark), _prices_usd(spark)
    ).collect()}
    assert set(out) == {"P1", "P2"}  # deleted pool excluded
    # P1: native leg at face 100 XLM; USD leg 200 * 10 (latest) = 2000 XLM
    assert out["P1"]["asset_a_value_xlm"] == 100.0
    assert out["P1"]["asset_b_value_xlm"] == 2000.0
    assert out["P1"]["xlm_price_usd"] == 0.2  # latest USD price
    assert out["P1"]["total_value_locked"] == (100.0 + 2000.0) * 0.2
    # P2: EUR 50*11, USD 60*10
    assert out["P2"]["asset_a_value_xlm"] == 550.0
    assert out["P2"]["asset_b_value_xlm"] == 600.0


def test_relevant_asset_trades(spark):
    trades = spark.createDataFrame(
        [
            # both legs meaningful (USD sell, EUR buy) -> kept
            (1, 0, datetime(2024, 1, 1, 12), "sA", "USD", "I1", "credit_alphanum4", 10.0,
             "bA", "EUR", "I2", "credit_alphanum4", 20.0, 1, 2, "LP9", 30),
            # sell native, buy meaningful -> kept, AMM tag null pool -> DEX
            (2, 0, datetime(2024, 1, 1, 12), "sB", None, None, "native", 5.0,
             "bB", "USD", "I1", "credit_alphanum4", 50.0, 1, 1, None, None),
            # buy leg junk asset -> dropped
            (3, 0, datetime(2024, 1, 1, 12), "sC", "USD", "I1", "credit_alphanum4", 1.0,
             "bC", "JUNK", "I9", "credit_alphanum4", 1.0, 1, 1, None, None),
        ],
        "history_operation_id long, order long, ledger_closed_at timestamp, "
        "selling_account_address string, selling_asset_code string, selling_asset_issuer string, selling_asset_type string, selling_amount double, "
        "buying_account_address string, buying_asset_code string, buying_asset_issuer string, buying_asset_type string, buying_amount double, "
        "price_n long, price_d long, selling_liquidity_pool_id string, liquidity_pool_fee long",
    )
    meaningful = spark.createDataFrame([("USD", "I1"), ("EUR", "I2")], "code string, issuer string")
    out = {r["selling_account_address"]: r for r in marts.relevant_asset_trades(
        trades, meaningful, _prices_xlm(spark), _prices_usd(spark)
    ).collect()}
    assert set(out) == {"sA", "sB"}
    out = {"sA": out["sA"], 1: out["sA"], 2: out["sB"]}
    # trade 1 at Jan 1 12:00: USD price 8 (window [Jan1, Jan2)), XLM/USD 0.1
    assert out[1]["selling_amount_usd"] == 10.0 * 0.1 * 8.0
    assert out[1]["buying_amount_usd"] == 20.0 * 0.1 * 11.0
    assert out[1]["trade_type"] == "AMM"
    # trade 2: native sell leg valued at xlm price only
    assert out[2]["selling_amount_usd"] == 5.0 * 0.1
    assert out[2]["trade_type"] == "DEX"


def test_liquidity_pool_trade_volume(spark):
    trades = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 12), "P1", None, None, "native", 10.0,
             "bA", "USD", "I1", "credit_alphanum4", 80.0, 1, 2, 30),
        ],
        "ledger_closed_at timestamp, selling_liquidity_pool_id string, "
        "selling_asset_code string, selling_asset_issuer string, selling_asset_type string, selling_amount double, "
        "buying_account_address string, buying_asset_code string, buying_asset_issuer string, buying_asset_type string, "
        "buying_amount double, price_n long, price_d long, liquidity_pool_fee long",
    )
    out = marts.liquidity_pool_trade_volume(
        trades, _pools_current(spark), _prices_xlm(spark), _prices_usd(spark)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["asset_pair"] == "XLM:USD"
    # buying leg USD at as-of price 8 (Jan 1), xlm 0.1; fee multiplier 1.003
    gross = 80.0 * 8.0 * 0.1
    assert abs(r["trade_amount"] - gross / 1.003) < 1e-9
    assert abs(r["fee_earned"] - (gross - gross / 1.003)) < 1e-9
    # selling asset (native, code NULL) != asset_b -> quote = n/d
    assert r["quote_price"] == 0.5
