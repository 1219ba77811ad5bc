"""Bucketed range join: large-x-large interval joins as equi-joins.

The reference's price-attribution join (v_liquidity_pool_trade_volume.sql:
88-95) matches fact timestamps into [valid_from, valid_to) windows. With a
broadcastable window side Catalyst plans a broadcast + range filter (q07);
when BOTH sides are large it degenerates to BroadcastNestedLoopJoin /
cartesian-per-key — the one join shape Catalyst won't make fast by default
(SURVEY §2.4 flags exactly this).

``bucketed_range_join`` applies the standard fix (the same design as
Databricks' range-join bin optimization): quantize time into fixed-width
buckets, explode each validity interval into the buckets it overlaps,
equi-join facts on (key, bucket), then apply the exact range predicate.
Cost: one shuffle of |facts| + |intervals x avg_buckets_per_interval| rows
on a fine-grained key — no per-key pair blow-up, AQE-splittable, scales to
both sides huge. Bucket width tunes the duplication-vs-selectivity trade:
width ~ median interval length is a good default.

Unbounded interval ends (the LEAD() default '2200-01-01') would explode
into millions of buckets — they are clamped to the facts' max timestamp
first, which preserves semantics for any fact row that exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    key: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from_ts",
    valid_to: str = "valid_to_ts",
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to interval rows of the same ``key`` satisfying
    ``valid_from <= fact_ts < valid_to``, without a nested-loop plan.

    ``how``: 'inner' or 'left' (left keeps unmatched facts with NULL
    interval columns). Interval columns come through under their original
    names; callers project what they need.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"bucketed_range_join supports inner/left, got {how!r}")
    secs = _bucket_seconds(bucket)

    # Left mode tags each fact with a surrogate row id and anti-joins the
    # add-back on that id alone. Anti-joining on the full fact column list
    # breaks on NULLs (a matched row with any NULL column never
    # equality-matches itself and would be re-appended as a spurious
    # unmatched duplicate) and on genuinely duplicate fact rows.
    if how == "left":
        facts = facts.withColumn("_rid", F.monotonically_increasing_id())

    f = facts.withColumn("_bkt", (F.unix_timestamp(F.col(fact_ts)) / secs).cast("long"))
    # clamp open-ended validity to the data horizon, then explode each
    # interval into every bucket it overlaps
    horizon = facts.select(F.max(fact_ts).alias("_h"))
    iv = intervals.crossJoin(F.broadcast(horizon)).withColumn(
        "_to_c",
        F.least(F.col(valid_to), F.col("_h") + F.expr("INTERVAL 1 SECOND")),
    )
    iv = iv.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(valid_from)) / secs).cast("long"),
                (F.unix_timestamp(F.col("_to_c")) / secs).cast("long"),
            )
        ),
    ).drop("_h", "_to_c")

    cond = (
        (F.col(fact_ts) >= F.col(valid_from))
        & (F.col(fact_ts) < F.col(valid_to))
    )
    joined = f.join(iv, [key, "_bkt"], "inner").filter(cond).drop("_bkt")
    if how == "inner":
        return joined
    # left: add back facts with no qualifying interval (NULL interval cols)
    unmatched = f.drop("_bkt").join(joined.select("_rid"), "_rid", "left_anti")
    return joined.unionByName(unmatched, allowMissingColumns=True).drop("_rid")


def _bucket_seconds(bucket: str) -> int:
    qty, unit = bucket.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(qty) * mult
