"""Analytic view/mart ports: as-of price joins, TVL, liquidity providers,
relevant trades, OHLC.

These are the remaining dags/ddls/queries views, expressed as DataFrame
pipelines over the current-state views and history tables. The price
dimensions are always broadcast — they are tiny (one row per asset per
update) while trades are the 100 TB fact side, so the as-of range join
stays a broadcast nested-loop on the range predicate with equi-key
pre-hashing (SURVEY §4: the one join Catalyst won't make fast by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def validity_windows(
    prices: DataFrame,
    partition_keys: tuple[str, ...],
    ts_col: str = "last_updated_ts",
    price_col: str = "price_in_xlm",
) -> DataFrame:
    """LEAD(ts,1,'2200-01-01') SCD-2 windows
    (v_liquidity_pool_trade_volume.sql:31-54)."""
    w = Window.partitionBy(*partition_keys).orderBy(F.col(ts_col).asc())
    return prices.select(
        *partition_keys,
        F.col(price_col).alias("price"),
        F.col(ts_col).alias("valid_from_ts"),
        F.coalesce(F.lead(ts_col, 1).over(w), F.lit("2200-01-01").cast("timestamp")).alias("valid_to_ts"),
    )


def asof_join(
    facts: DataFrame,
    windows: DataFrame,
    fact_ts: str,
    equi_keys: list[tuple[str, str]],
    how: str = "left",
) -> DataFrame:
    """facts joined to price validity windows: equi keys + half-open range
    (v_liquidity_pool_trade_volume.sql:88-95). The window side is broadcast."""
    cond = (F.col(fact_ts) >= F.col("valid_from_ts")) & (F.col(fact_ts) < F.col("valid_to_ts"))
    for fk, wk in equi_keys:
        cond = cond & (facts[fk] == windows[wk])
    return facts.join(F.broadcast(windows), cond, how)


def liquidity_pool_trade_volume(
    trades: DataFrame,
    pools_current: DataFrame,
    asset_prices_xlm: DataFrame,
    asset_prices_usd: DataFrame,
) -> DataFrame:
    """Port of v_liquidity_pool_trade_volume.sql — AMM trade volume with
    base/quote prices and fee attribution. The scalar price/fee
    arithmetic (:69-86) lives ONCE in ``functions/sharedsql.py`` as
    Catalyst-inlined SQL UDFs (VERDICT r12 ask #5) — the plan carries
    plain expressions, no UDF node (tests/test_shared_functions.py)."""
    from ..functions import sharedsql as SX

    SX.register_shared_functions(trades.sparkSession)
    tv = (
        trades.join(
            pools_current.select(
                F.col("liquidity_pool_id"),
                "asset_a_code",
                "asset_a_issuer",
                "asset_b_code",
                "asset_b_issuer",
                "asset_pair",
            ),
            trades["selling_liquidity_pool_id"] == F.col("liquidity_pool_id"),
        )
        .withColumn("fee_multiplier", SX.fee_multiplier(F.col("liquidity_pool_fee")))
    )
    asset_price = validity_windows(asset_prices_xlm, ("asset_code", "asset_issuer")).withColumnsRenamed(
        {"asset_code": "p_code", "asset_issuer": "p_issuer"}
    )
    xlm_price = validity_windows(asset_prices_usd, ("asset_id",), price_col="price_in_usd").select(
        F.col("price").alias("xlm_price"),
        F.col("valid_from_ts").alias("x_from"),
        F.col("valid_to_ts").alias("x_to"),
    )
    t = tv.join(
        F.broadcast(asset_price),
        (tv["buying_asset_code"] == F.col("p_code"))
        & (tv["buying_asset_issuer"] == F.col("p_issuer"))
        & (tv["ledger_closed_at"] >= F.col("valid_from_ts"))
        & (tv["ledger_closed_at"] < F.col("valid_to_ts")),
        "left",
    ).join(
        F.broadcast(xlm_price),
        (tv["ledger_closed_at"] >= F.col("x_from")) & (tv["ledger_closed_at"] < F.col("x_to")),
        "left",
    )
    gross = SX.gross_usd(
        F.col("buying_asset_type") == "native",
        F.col("buying_amount"),
        F.col("price"),
        F.col("xlm_price"),
    )
    sell_is_b = F.col("selling_asset_code") == F.col("asset_b_code")
    return t.select(
        "ledger_closed_at",
        "selling_liquidity_pool_id",
        "asset_a_code",
        "asset_a_issuer",
        "asset_b_code",
        "asset_b_issuer",
        "asset_pair",
        "selling_asset_code",
        "selling_amount",
        "buying_asset_code",
        "buying_amount",
        F.col("price").alias("asset_price_in_xlm"),
        "xlm_price",
        SX.fee_earned(gross, F.col("fee_multiplier")).alias("fee_earned"),
        SX.trade_amount(gross, F.col("fee_multiplier")).alias("trade_amount"),
        "price_n",
        "price_d",
        SX.directed_price("price_n", "price_d", sell_is_b).alias("quote_price"),
        # base is quote with the legs swapped — same flag, so a NULL
        # selling code takes the ELSE branch in BOTH, like the reference
        SX.directed_price("price_d", "price_n", sell_is_b).alias("base_price"),
    )


def liquidity_providers(operations: DataFrame, transactions: DataFrame) -> DataFrame:
    """Port of v_liquidity_providers.sql — per-(account, pool) share
    accounting from LP deposit (type 22) / withdraw (type 23) operations;
    NULL ``successful`` counts as success (:17-19)."""
    ok = transactions.filter((F.col("successful") == True) | F.col("successful").isNull()).select(  # noqa: E712
        F.col("id").alias("tx_id")
    )
    ops = operations.join(ok, operations["transaction_id"] == F.col("tx_id"), "left_semi")
    deposits = (
        ops.filter(F.col("type") == 22)
        .groupBy(F.col("source_account").alias("account"), F.col("details.liquidity_pool_id").alias("pool"))
        .agg(
            F.sum(F.coalesce(F.col("details.shares_received"), F.lit(0.0))).alias("shares_in"),
            F.min("closed_at").alias("first_deposit"),
            F.count(F.lit(1)).alias("n_deposits"),
        )
    )
    withdrawals = (
        ops.filter(F.col("type") == 23)
        .groupBy(F.col("source_account").alias("account"), F.col("details.liquidity_pool_id").alias("pool"))
        .agg(F.sum(F.coalesce(F.col("details.shares"), F.lit(0.0))).alias("shares_out"))
    )
    return (
        deposits.join(withdrawals, ["account", "pool"], "left")
        .withColumn("current_shares", F.col("shares_in") - F.coalesce(F.col("shares_out"), F.lit(0.0)))
    )


def ohlc(trades: DataFrame, ts_col: str = "ledger_closed_at") -> DataFrame:
    """Daily OHLC per asset pair (the ohlc dbt mart; task_sla.ohlc)."""
    from ..functions import sharedsql as SX

    SX.register_shared_functions(trades.sparkSession)
    price = SX.price_ratio("price_n", "price_d")
    return (
        trades.withColumn("_price", price)
        .groupBy(F.col("selling_asset_id"), F.col("buying_asset_id"), F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(
            F.min_by("_price", ts_col).alias("open"),
            F.max("_price").alias("high"),
            F.min("_price").alias("low"),
            F.max_by("_price", ts_col).alias("close"),
            F.sum("selling_amount").alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def liquidity_pool_value(
    pools_current: DataFrame,
    asset_prices_xlm: DataFrame,
    asset_prices_usd: DataFrame,
) -> DataFrame:
    """Port of v_liquidity_pool_value.sql — TVL per pool: each leg valued
    at its latest XLM price (rank()=1 per asset), native legs at face
    value, the latest XLM/USD price cross-joined onto every row (:74-79),
    ordered by total_value_locked desc (:80)."""
    live = pools_current.filter(F.col("deleted") == False)  # noqa: E712
    wp = Window.partitionBy("asset_code", "asset_issuer").orderBy(F.col("last_updated_ts").desc())
    latest_price = (
        asset_prices_xlm.withColumn("rank_nr", F.rank().over(wp))
        .filter(F.col("rank_nr") == 1)
        .select(F.col("asset_code").alias("p_code"), F.col("asset_issuer").alias("p_issuer"), "price_in_xlm")
    )
    a = (
        live.join(
            F.broadcast(latest_price),
            (live["asset_a_code"] == F.col("p_code")) & (live["asset_a_issuer"] == F.col("p_issuer")),
            "left",
        )
        .select(
            "liquidity_pool_id",
            "asset_pair",
            F.when(F.col("asset_a_type") == "native", F.col("asset_a_amount"))
            .otherwise(F.col("asset_a_amount") * F.coalesce(F.col("price_in_xlm"), F.lit(0)))
            .alias("asset_a_value_xlm"),
        )
    )
    b = (
        live.join(
            F.broadcast(latest_price),
            (live["asset_b_code"] == F.col("p_code")) & (live["asset_b_issuer"] == F.col("p_issuer")),
            "left",
        )
        .select(
            F.col("liquidity_pool_id").alias("b_pool_id"),
            (F.col("asset_b_amount") * F.coalesce(F.col("price_in_xlm"), F.lit(0))).alias("asset_b_value_xlm"),
        )
    )
    wx = Window.orderBy(F.col("last_updated_ts").desc())
    xlm_usd = (
        asset_prices_usd.withColumn("rank_nr", F.row_number().over(wx))
        .filter(F.col("rank_nr") == 1)
        .select(F.col("price_in_usd").alias("xlm_price_usd"))
    )
    return (
        a.join(b, a["liquidity_pool_id"] == b["b_pool_id"])
        .crossJoin(F.broadcast(xlm_usd))
        .select(
            "liquidity_pool_id",
            "asset_pair",
            "asset_a_value_xlm",
            "asset_b_value_xlm",
            "xlm_price_usd",
            (F.col("asset_a_value_xlm") * F.col("xlm_price_usd")).alias("asset_a_usd_value"),
            (F.col("asset_b_value_xlm") * F.col("xlm_price_usd")).alias("asset_b_usd_value"),
            (
                F.col("asset_a_value_xlm") * F.col("xlm_price_usd")
                + F.col("asset_b_value_xlm") * F.col("xlm_price_usd")
            ).alias("total_value_locked"),
        )
        .orderBy(F.col("total_value_locked").desc())
    )


def relevant_asset_trades(
    trades: DataFrame,
    meaningful_assets: DataFrame,
    asset_prices_xlm: DataFrame,
    asset_prices_usd: DataFrame,
) -> DataFrame:
    """Port of v_relevant_asset_trades.sql — keep trades whose BOTH legs
    are meaningful (or native), USD-value each leg with as-of prices, tag
    AMM vs DEX (:75). The OR of semi-join and native predicate is the
    left-join + IS NOT NULL pattern (:6-27); both sides must qualify, so
    the sell- and buy-qualifying sets are inner-joined on the trade key
    (history_operation_id, `order` — the reserved-word column)."""
    ma = F.broadcast(meaningful_assets.select(F.col("code").alias("m_code"), F.col("issuer").alias("m_issuer")))
    sales = (
        trades.join(
            ma,
            (trades["selling_asset_code"] == F.col("m_code")) & (trades["selling_asset_issuer"] == F.col("m_issuer")),
            "left",
        )
        .filter(F.col("m_code").isNotNull() | (F.col("selling_asset_type") == "native"))
        .drop("m_code", "m_issuer")
    )
    buys = (
        trades.join(
            ma,
            (trades["buying_asset_code"] == F.col("m_code")) & (trades["buying_asset_issuer"] == F.col("m_issuer")),
            "left",
        )
        .filter(F.col("m_code").isNotNull() | (F.col("buying_asset_type") == "native"))
        .select(F.col("history_operation_id").alias("b_op_id"), F.col("order").alias("b_order"))
    )
    s = sales.join(
        buys, (sales["history_operation_id"] == F.col("b_op_id")) & (sales["order"] == F.col("b_order"))
    )
    sell_win = validity_windows(asset_prices_xlm, ("asset_code", "asset_issuer")).select(
        F.col("asset_code").alias("c_code"), F.col("asset_issuer").alias("c_issuer"),
        F.col("price").alias("c_price"), F.col("valid_from_ts").alias("c_from"), F.col("valid_to_ts").alias("c_to"),
    )
    buy_win = validity_windows(asset_prices_xlm, ("asset_code", "asset_issuer")).select(
        F.col("asset_code").alias("d_code"), F.col("asset_issuer").alias("d_issuer"),
        F.col("price").alias("d_price"), F.col("valid_from_ts").alias("d_from"), F.col("valid_to_ts").alias("d_to"),
    )
    xlm_win = validity_windows(asset_prices_usd, ("asset_id",), price_col="price_in_usd").select(
        F.col("price").alias("x_price"), F.col("valid_from_ts").alias("x_from"), F.col("valid_to_ts").alias("x_to")
    )
    t = (
        s.join(
            F.broadcast(sell_win),
            (s["selling_asset_code"] == F.col("c_code")) & (s["selling_asset_issuer"] == F.col("c_issuer"))
            & (s["ledger_closed_at"] >= F.col("c_from")) & (s["ledger_closed_at"] < F.col("c_to")),
            "left",
        )
        .join(
            F.broadcast(buy_win),
            (s["buying_asset_code"] == F.col("d_code")) & (s["buying_asset_issuer"] == F.col("d_issuer"))
            & (s["ledger_closed_at"] >= F.col("d_from")) & (s["ledger_closed_at"] < F.col("d_to")),
            "left",
        )
        .join(
            F.broadcast(xlm_win),
            (s["ledger_closed_at"] >= F.col("x_from")) & (s["ledger_closed_at"] < F.col("x_to")),
            "left",
        )
    )
    x = F.coalesce(F.col("x_price"), F.lit(0))
    sell_usd = F.when(F.col("selling_asset_type") == "native", F.col("selling_amount") * x).otherwise(
        F.col("selling_amount") * x * F.coalesce(F.col("c_price"), F.lit(0))
    )
    buy_usd = F.when(F.col("buying_asset_type") == "native", F.col("buying_amount") * x).otherwise(
        F.col("buying_amount") * x * F.coalesce(F.col("d_price"), F.lit(0))
    )
    return t.select(
        "ledger_closed_at",
        "selling_account_address",
        "selling_asset_code",
        "selling_asset_issuer",
        "selling_asset_type",
        "selling_amount",
        sell_usd.alias("selling_amount_usd"),
        "buying_account_address",
        "buying_asset_code",
        "buying_asset_issuer",
        "buying_asset_type",
        "buying_amount",
        buy_usd.alias("buying_amount_usd"),
        "price_n",
        "price_d",
        "selling_liquidity_pool_id",
        "liquidity_pool_fee",
        F.when(F.col("selling_liquidity_pool_id").isNotNull(), "AMM").otherwise("DEX").alias("trade_type"),
    )


def history_assets_dedup_insert(staging: DataFrame, existing: DataFrame) -> DataFrame:
    """Port of dags/queries/history_assets.sql:5-62: oldest-wins window
    dedup of the staging batch, then anti-join against already-loaded
    assets (the staging + dedup-insert alternative to MERGE, SURVEY §4)."""
    keys = ("asset_type", "asset_code", "asset_issuer")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col("batch_run_date").asc())
    fresh = staging.withColumn("dupe_count", F.row_number().over(w)).filter(F.col("dupe_count") == 1).drop("dupe_count")
    return fresh.join(existing.select(*keys), list(keys), "left_anti")
