"""Join-branch LIVENESS for the derived-input mart entries (q71-q74).

Review r13 found q71's asset-price as-of join structurally DEAD: the
derived price series only covered even-parity asset codes while the
non-native buying legs only carried odd-parity codes, so the join never
matched, every price was NULL, and oracle parity passed VACUOUSLY — a
bug in the join itself would have gone undetected. Parity proves
equality of results; it cannot prove the results exercise the code.

These tests pin liveness mechanically: every nullable joined/branched
column in each mart entry's output must be non-null for at least one
row AND null for at least one row (both CASE branches live) at the
smoke SF, so a future edit to the derived inputs that kills a branch
fails here instead of shipping a vacuous oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.queries import QUERIES

from .conftest import SF_SMOKE

# entry -> columns that must have BOTH null and non-null rows (a joined
# payload or an optional attribute whose null-ness drives a branch)
_MIXED = {
    # xlm_price is mixed too: trades BEFORE the first price update take
    # the NULL branch (coalesce->0 gross) — that branch must stay live
    "q71_trade_volume_mart": ["asset_price_in_xlm", "selling_asset_code", "xlm_price"],
    "q72_liquidity_providers": [],
    "q73_liquidity_pool_value": [],
    "q74_relevant_asset_trades": ["selling_asset_code", "buying_asset_code",
                                  "selling_liquidity_pool_id"],
}
# entry -> columns that must be non-null on AT LEAST one row (the join
# is live) without requiring a null row — q72's shares_out is null only
# for deposit-only providers, which the dense smoke key space lacks
_LIVE = {
    "q72_liquidity_providers": ["shares_out"],
}
# entry -> columns that must be non-null on EVERY row at this SF
_ALL = {
    "q71_trade_volume_mart": ["trade_amount", "fee_earned"],
    "q72_liquidity_providers": ["shares_in", "first_deposit", "current_shares"],
    "q73_liquidity_pool_value": ["xlm_price_usd", "total_value_locked"],
    "q74_relevant_asset_trades": ["selling_amount_usd", "buying_amount_usd", "trade_type"],
}
# entry -> (column, predicate) pairs: at least one row must satisfy each,
# proving a specific value-branch runs (not just null-ness)
# SQL-string predicates (Column objects need a live SparkContext, which
# doesn't exist at collection time)
_SOME = {
    "q71_trade_volume_mart": ["trade_amount > 0"],
    "q73_liquidity_pool_value": [
        # native legs valued at face, priceless codes at 0, priced codes > 0
        "asset_a_value_xlm > 0",
        "asset_b_value_xlm = 0",
        "asset_b_value_xlm > 0",
    ],
    "q74_relevant_asset_trades": [
        "trade_type = 'AMM'",
        "trade_type = 'DEX'",
        "selling_amount_usd > 0",
    ],
}


@pytest.mark.parametrize("name", sorted(_MIXED))
def test_mart_entry_branches_live(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE).cache()
    try:
        total = df.count()
        assert total > 0, f"{name}: empty output"
        problems = []
        for col in _MIXED[name]:
            nn = df.where(F.col(col).isNotNull()).count()
            if nn == 0:
                problems.append(f"{col}: never non-null (dead join/branch)")
            if nn == total:
                problems.append(f"{col}: never null (null branch dead)")
        for col in _LIVE.get(name, []):
            if df.where(F.col(col).isNotNull()).count() == 0:
                problems.append(f"{col}: never non-null (dead join)")
        for col in _ALL[name]:
            n_null = df.where(F.col(col).isNull()).count()
            if n_null:
                problems.append(f"{col}: {n_null} unexpected nulls")
        for pred in _SOME.get(name, []):
            if df.where(pred).count() == 0:
                problems.append(f"{pred!r}: predicate branch never taken")
        assert not problems, f"{name}: " + "; ".join(problems)
    finally:
        df.unpersist()
