"""Current-state views: the v_*_current family.

All 7 dedup views in the reference share one shape
(dags/ddls/queries/v_accounts_current.sql, v_offers_current.sql,
v_trust_lines_current.sql, v_account_signers_current.sql,
v_claimable_balances_current.sql, v_liquidity_pools_current.sql):

  change-log table
    GROUP BY all columns            (defensive duplicate collapse)
    JOIN history_ledgers ON last_modified_ledger = sequence  (closed_at)
    DENSE_RANK() OVER (PARTITION BY natural-key
                       ORDER BY last_modified_ledger DESC,
                                ledger_entry_change DESC) = 1

``latest_state_view`` is the parameterized port; per-table wrappers pin
the natural keys (the same keys the MERGE path uses,
build_apply_gcs_changes_to_bq_task.py:78-113). The ledgers side of the
join is a broadcast candidate — per-batch ledger counts are tiny relative
to state-change volume at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_ORDER = ("last_modified_ledger", "ledger_entry_change")


def latest_state_view(
    changes: DataFrame,
    ledgers: DataFrame | None,
    keys: tuple[str, ...],
    order_cols: tuple[str, ...] = DEFAULT_ORDER,
    broadcast_ledgers: bool = True,
) -> DataFrame:
    df = changes.distinct()  # the GROUP BY-all-columns quirk
    if ledgers is not None:
        led = ledgers.select(F.col("sequence").alias("_seq"), F.col("closed_at").alias("closed_at"))
        if broadcast_ledgers:
            led = F.broadcast(led)
        df = df.drop("closed_at").join(led, df["last_modified_ledger"] == led["_seq"], "inner").drop("_seq")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*[F.col(c).desc() for c in order_cols])
    return df.withColumn("rank_number", F.dense_rank().over(w)).filter(F.col("rank_number") == 1).drop("rank_number")


def v_accounts_current(accounts: DataFrame, ledgers: DataFrame) -> DataFrame:
    """v_accounts_current.sql:5-87."""
    return latest_state_view(accounts, ledgers, ("account_id",))


def v_account_signers_current(signers: DataFrame, ledgers: DataFrame) -> DataFrame:
    return latest_state_view(signers, ledgers, ("account_id", "signer"))


def v_offers_current(offers: DataFrame, ledgers: DataFrame) -> DataFrame:
    """dense_rank over (seller_id, offer_id)."""
    return latest_state_view(offers, ledgers, ("seller_id", "offer_id"))


def v_claimable_balances_current(cb: DataFrame, ledgers: DataFrame) -> DataFrame:
    return latest_state_view(cb, ledgers, ("balance_id",))


def v_liquidity_pools_current(pools: DataFrame, ledgers: DataFrame) -> DataFrame:
    """v_liquidity_pools_current.sql — adds the asset_pair naming CASE
    (XLM: prefix for the native leg, :11-13)."""
    cur = latest_state_view(pools, ledgers, ("liquidity_pool_id",))
    pair = F.when(
        F.col("asset_a_type") == "native",
        F.concat(F.lit("XLM:"), F.col("asset_b_code")),
    ).otherwise(F.concat(F.col("asset_a_code"), F.lit(":"), F.col("asset_b_code")))
    return cur.withColumn("asset_pair", pair)


def v_trust_lines_current(tl: DataFrame, ledgers: DataFrame) -> DataFrame:
    """4-column composite dedup key (v_trust_lines_current.sql:23-26)."""
    return latest_state_view(tl, ledgers, ("account_id", "asset_code", "asset_issuer", "liquidity_pool_id"))
