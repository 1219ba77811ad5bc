"""Shared scalar business expressions as INLINED SQL UDFs.

The reference repeats the same price/fee arithmetic across its view SQL
(``v_liquidity_pool_trade_volume.sql:69-86``: the buying-asset price
CASE, the ``fee_earned``/``trade_amount`` split through the pool's fee
multiplier, and the ``quote_price``/``base_price`` direction CASE), and
until r13 this engine hand-duplicated the same expressions across
``views/marts.py``, ``queries/relational.py::q07`` and
``queries/streamingq.py`` (VERDICT r12 ask #5). This module defines
each expression ONCE as a Spark 4 SQL scalar function
(``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>`` — the q69
mechanism, ``queries/relational3.py``) plus a thin Column helper.

Why SQL UDFs and not plain Python Column builders: the definition is
one SQL string (auditable against the reference's SQL line for line),
callable from BOTH the DataFrame API (``F.call_function``) and any
``spark.sql`` text, and Catalyst INLINES the body during analysis — the
optimized plan contains the raw arithmetic, no UDF/eval node, so
whole-stage codegen and pushdown see straight expressions
(``tests/test_shared_functions.py`` pins that plan contract). Zero
runtime cost at any scale; this is a naming layer, not an execution
layer.

Registration is session-scoped (temp functions do not cross
``newSession()`` children), idempotent, and guarded by the same
process-wide lock discipline as ``session.register_python_source`` —
pooled bench threads may race a CREATE against a concurrent plan.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# name -> (signature, body). Bodies cite the reference expression they
# restate; keep them textually close to the SQL they replace.
_FUNCS: dict[str, tuple[str, str]] = {
    # v_liquidity_pool_trade_volume.sql:42 ("1 + liquidity_pool_fee/10000"
    # in the trade_volume CTE): basis-point fee -> multiplicative factor
    "sx_fee_multiplier": (
        "(fee_bp DOUBLE) RETURNS DOUBLE",
        "1 + fee_bp / 10000",
    ),
    # v_liquidity_pool_trade_volume.sql:69-76 buying-leg gross value in
    # USD: native legs at the XLM/USD price, other assets through their
    # as-of XLM price; missing prices value the leg at 0 (the COALESCEs)
    "sx_gross_usd": (
        "(is_native BOOLEAN, amount DOUBLE, price_xlm DOUBLE, xlm_usd DOUBLE) "
        "RETURNS DOUBLE",
        "CASE WHEN is_native THEN amount * coalesce(xlm_usd, 0) "
        "ELSE amount * coalesce(price_xlm, 0) * coalesce(xlm_usd, 0) END",
    ),
    # v_liquidity_pool_trade_volume.sql:69-77: the pool keeps
    # gross - gross/mult ...
    "sx_fee_earned": (
        "(gross DOUBLE, fee_mult DOUBLE) RETURNS DOUBLE",
        "gross - gross / fee_mult",
    ),
    # ... and the trade nets gross/mult (:78-82)
    "sx_trade_amount": (
        "(gross DOUBLE, fee_mult DOUBLE) RETURNS DOUBLE",
        "gross / fee_mult",
    ),
    # v_liquidity_pool_trade_volume.sql:85-86 quote/base direction CASE:
    # a NULL flag takes the ELSE branch, exactly like the reference CASE
    "sx_directed_price": (
        "(n DOUBLE, d DOUBLE, invert BOOLEAN) RETURNS DOUBLE",
        "CASE WHEN invert THEN d / n ELSE n / d END",
    ),
    # the plain trade price ratio (ohlc mart; history_trades price_n/d)
    "sx_price_ratio": (
        "(n DOUBLE, d DOUBLE) RETURNS DOUBLE",
        "n / d",
    ),
}

_LOCK = threading.Lock()
_ATTR = "_sx_shared_funcs_registered"


def register_shared_functions(spark: SparkSession) -> None:
    """Create the shared temp functions on ``spark`` (idempotent per
    session; cheap catalog DDL, no jobs). Call before building any plan
    that uses the helpers below — each view/query entry does, so every
    entry stays session-self-sufficient (the s11/s13 lesson)."""
    with _LOCK:
        if getattr(spark, _ATTR, False):
            return
        for name, (sig, body) in _FUNCS.items():
            spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
        setattr(spark, _ATTR, True)


def _col(c) -> Column:
    return c if isinstance(c, Column) else (F.lit(c) if not isinstance(c, str) else F.col(c))


def fee_multiplier(fee_bp) -> Column:
    return F.call_function("sx_fee_multiplier", _col(fee_bp).cast("double"))


def gross_usd(is_native, amount, price_xlm, xlm_usd) -> Column:
    return F.call_function(
        "sx_gross_usd", _col(is_native), _col(amount), _col(price_xlm), _col(xlm_usd)
    )


def fee_earned(gross, fee_mult) -> Column:
    return F.call_function("sx_fee_earned", _col(gross), _col(fee_mult))


def trade_amount(gross, fee_mult) -> Column:
    return F.call_function("sx_trade_amount", _col(gross), _col(fee_mult))


def directed_price(n, d, invert) -> Column:
    return F.call_function(
        "sx_directed_price", _col(n).cast("double"), _col(d).cast("double"), _col(invert)
    )


def price_ratio(n, d) -> Column:
    return F.call_function("sx_price_ratio", _col(n).cast("double"), _col(d).cast("double"))
