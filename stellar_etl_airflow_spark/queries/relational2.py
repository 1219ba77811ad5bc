"""Second relational batch: remaining scalar families from the audit-log
corpus, provider-style accounting, and a cross-table training join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QuerySpec, dsum, dsum_sql, tables

# ---------------------------------------------------------------------------
# q21 — scalar corpus #2: REGEXP_EXTRACT_ALL / REGEXP_CONTAINS / REPLACE /
# FORMAT / SAFE_CAST / TIMESTAMP_ADD / DATE_DIFF(month) / ARRAY_LENGTH /
# from_json nested access (audit_log.sql:136-141,230,457-458,469-471,726;
# contract_data NUL-strip REPLACE fixup generate_avro/contract_data.sql:28).
# ---------------------------------------------------------------------------


def q21_scalar_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    months = (F.year(F.col("ts")) * 12 + F.month(F.col("ts"))) - (12 * 2024 + 1)
    return ev.select(
        "event_id",
        F.size(F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), F.lit(0))).alias("n_number_runs"),
        F.col("event_type").rlike("^(click|view)$").alias("is_passive"),
        F.replace(F.col("event_type"), F.lit("e"), F.lit("")).alias("replaced"),
        F.format_string("%s-%05d", F.col("event_type"), F.col("user_id")).alias("formatted"),
        F.expr("try_cast(event_type as bigint)").alias("bad_cast_is_null"),
        F.expr("try_cast(get_json_object(props, '$.k') as bigint)").alias("k_safe"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("ts_plus_30m"),
        months.alias("months_since_jan24"),
        F.size(F.split(F.col("event_type"), "")).alias("n_chars_arr"),
        F.from_json(F.col("props"), "k bigint").getField("k").alias("k_from_json"),
    )


Q21_SQL = """
SELECT event_id,
       len(regexp_extract_all(props, '[0-9]+'))                  AS n_number_runs,
       regexp_matches(event_type, '^(click|view)$')              AS is_passive,
       replace(event_type, 'e', '')                              AS replaced,
       printf('%s-%05d', event_type, user_id)                    AS formatted,
       TRY_CAST(event_type AS BIGINT)                            AS bad_cast_is_null,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)     AS k_safe,
       ts + INTERVAL 30 MINUTE                                   AS ts_plus_30m,
       (year(ts) * 12 + month(ts)) - (12 * 2024 + 1)             AS months_since_jan24,
       CAST(length(event_type) AS INT)                           AS n_chars_arr,
       CAST(json_extract_string(props, '$.k') AS BIGINT)         AS k_from_json
FROM events
"""


# ---------------------------------------------------------------------------
# q22 — provider-style share accounting: two filtered aggregates joined on
# the entity key, COALESCE'd subtraction (v_liquidity_providers.sql:3-43).
# purchases play deposits; clicks play withdrawals (value = shares).
# ---------------------------------------------------------------------------


def q22_provider_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    deposits = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            dsum(F.coalesce(F.col("value"), F.lit(0.0))).alias("shares_in"),
            F.min("ts").alias("first_deposit"),
            F.count(F.lit(1)).alias("n_deposits"),
        )
    )
    withdrawals = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(dsum(F.coalesce(F.col("value"), F.lit(0.0))).alias("shares_out"))
    )
    return (
        deposits.join(withdrawals, "user_id", "left")
        .select(
            "user_id",
            "shares_in",
            F.coalesce(F.col("shares_out"), F.lit(0.0)).alias("shares_out"),
            (F.col("shares_in") - F.coalesce(F.col("shares_out"), F.lit(0.0))).alias("current_shares"),
            "first_deposit",
            "n_deposits",
        )
    )


Q22_SQL = f"""
WITH deposits AS (
  SELECT user_id,
         {dsum_sql('coalesce(value, 0.0)')} AS shares_in,
         min(ts) AS first_deposit,
         count(*) AS n_deposits
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
withdrawals AS (
  SELECT user_id, {dsum_sql('coalesce(value, 0.0)')} AS shares_out
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT d.user_id, d.shares_in,
       coalesce(w.shares_out, 0.0) AS shares_out,
       d.shares_in - coalesce(w.shares_out, 0.0) AS current_shares,
       d.first_deposit, d.n_deposits
FROM deposits d LEFT JOIN withdrawals w ON d.user_id = w.user_id
"""


# ---------------------------------------------------------------------------
# q23 — cross-table training pipeline: quality-gated documents joined to
# their embeddings (doc_id = vec_id), emitting filter features + vector
# norms — the select-then-embed join every curation pipeline runs. The
# doc side carries only two small columns; at scale the join shuffles on
# the shared key with both sides pre-pruned.
# ---------------------------------------------------------------------------


def q23_docs_embeddings_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    d = docs.select("doc_id", "lang", F.size(words).alias("n_words"))
    norm = F.sqrt(F.expr("aggregate(transform(embedding, x -> cast(x as double)), 0D, (acc, v) -> acc + v * v)"))
    e = emb.select("vec_id", "label", F.round(norm, 6).alias("l2_norm"))
    return (
        d.filter(F.col("n_words") >= 20)
        .join(e, d.doc_id == e.vec_id)
        .select("doc_id", "lang", "n_words", "label", "l2_norm")
    )


Q23_SQL = r"""
SELECT d.doc_id, d.lang, d.n_words, e.label,
       round(sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
FROM (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS INT) AS n_words
  FROM documents
) d
JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.n_words >= 20
"""


# ---------------------------------------------------------------------------
# q24 — enrichment join: row-level wide projection over a 4-table join
# (the enriched_history_operations mart shape: operations + transactions +
# ledgers denormalized into one wide table; dbt_enriched_base_tables_dag).
# ---------------------------------------------------------------------------


def q24_enriched_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    na, cu, od, li = tables(spark, sf_dir, "nation", "customer", "orders", "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            "o_orderstatus",
            "o_orderdate",
            "c_custkey",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
        )
    )


Q24_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS net_price,
       o_orderstatus, o_orderdate, c_custkey, c_mktsegment,
       n_name AS nation
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
"""


# ---------------------------------------------------------------------------
# q25 — two-stage mart: aggregate then rank within group, keep top 3
# (the trade_agg/asset_stats mart family: aggregate per entity, rank per
# dimension; SURVEY §2.4 window functions over aggregates).
# ---------------------------------------------------------------------------


def q25_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa, li = tables(spark, sf_dir, "part", "lineitem")
    from pyspark.sql.window import Window

    rev = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
    return (
        rev.withColumn("brand_rank", F.row_number().over(w))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "brand_rank", "p_partkey", "revenue")
    )


Q25_SQL = f"""
WITH rev AS (
  SELECT p_brand, p_partkey,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, CAST(brand_rank AS INT) AS brand_rank, p_partkey, revenue
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS brand_rank
  FROM rev
)
WHERE brand_rank <= 3
"""


# ---------------------------------------------------------------------------
# q26 — correlated subquery (Catalyst decorrelates to a join): customers
# whose order count exceeds a threshold, with the count from a correlated
# scalar subquery. Integer-only semantics — no float boundary risk in the
# row-selection predicate.
# ---------------------------------------------------------------------------


def q26_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 12
        """
    )


Q26_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 12
"""


# ---------------------------------------------------------------------------
# q27 — as-of join via the union + running-window operator (operators/asof.py)
# — the LARGE-right-side scale path for the same price attribution q07 does
# with a broadcast range join (v_liquidity_pool_trade_volume.sql:88-95).
# Oracle: DuckDB's native ASOF LEFT JOIN. Ties on (user_id, ts) are broken
# by greatest event_id in both engines.
# ---------------------------------------------------------------------------


def q27_asof_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    (ev,) = tables(spark, sf_dir, "events")
    prices = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("price"), "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    joined = asof_join(
        clicks, prices, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["price"], tiebreak_cols=["event_id"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "price",
        (F.col("value") * F.coalesce(F.col("price"), F.lit(0.0))).alias("notional"),
    )


Q27_SQL = """
WITH prices AS (
  SELECT user_id, ts, price FROM (
    SELECT user_id, ts, value AS price,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
),
clicks AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id, c.ts, p.price,
       c.value * coalesce(p.price, 0) AS notional
FROM clicks c ASOF LEFT JOIN prices p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# ---------------------------------------------------------------------------
# q28 — ROLLUP + GROUPING indicator. The reference corpus has no grouping
# sets (SURVEY §2.4 "No grouping sets / cube / rollup"), but a complete
# engine needs them for the mart-style subtotal reports the dbt layer would
# otherwise union by hand. Map-side partial aggregation applies per
# grouping set, so the shuffle carries one pre-aggregated row per (set,
# group) — this scales the same as the q01 aggregate.
# ---------------------------------------------------------------------------


def q28_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            # grouping() is an aggregate-context expression: it must appear
            # in the agg list, not a downstream select
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


Q28_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       count(*) AS n_rows,
       {dsum_sql('l_extendedprice')} AS sum_price,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q29 — exact interpolated percentiles per group. Spark `percentile` and
# DuckDB `quantile_cont` share the linear-interpolation definition, so the
# doubles match bit-for-bit (verified at sf0.01). At 100 TB exact
# percentiles shuffle every value to its group; the scale path swaps in
# approx_percentile (t-digest) at the same call site — semantics
# documented, not oracle-checkable.
# ---------------------------------------------------------------------------


def q29_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    # One percentile buffer per COLUMN, not per percentage point: three
    # scalar percentile() calls on l_extendedprice each build their own
    # 600k-entry counts hashmap per partition (plan: 4 partial_percentile
    # buffers); the array form builds one and reads it at three points —
    # same counts map, same interpolation, bit-identical results
    # (optimization r13, guide §1.2: measured 2.91 s -> 1.06 s at sf0.1).
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.25, 0.9))").alias("pp"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
    )
    return agg.select(
        "l_returnflag",
        F.col("pp")[0].alias("p50_price"),
        F.col("pp")[1].alias("p25_price"),
        F.col("pp")[2].alias("p90_price"),
        "p50_qty",
    )


Q29_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_quantity, 0.5) AS p50_qty
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q30 — rolling window frames (ROWS BETWEEN n PRECEDING AND CURRENT ROW)
# + lag deltas. The reference corpus has no frame specs (SURVEY §2.4
# "No frame specs appear anywhere") but rolling aggregates are core
# analytics surface. The frame sum uses the DECIMAL(38,6) pattern INSIDE
# the window: sliding-window double accumulation is engine-specific
# (segment trees vs running subtraction), decimal sums are exact either
# way. Tie-free ordering via (ts, event_id).
# ---------------------------------------------------------------------------


def q30_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    (ev,) = tables(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w7 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-6, Window.currentRow)
    wo = Window.partitionBy("user_id").orderBy(*order)
    rsum = F.sum(F.col("value").cast("decimal(38,6)")).over(w7).cast("double")
    rn = F.count(F.lit(1)).over(w7)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            rsum.alias("rolling_sum"),
            rn.alias("rolling_n"),
            (rsum / rn).alias("rolling_avg"),
            F.lag("value", 1).over(wo).alias("prev_value"),
            (F.col("value") - F.lag("value", 1).over(wo)).alias("delta"),
        )
    )


Q30_SQL = """
SELECT event_id, user_id, ts, value,
       CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w7 AS DOUBLE) AS rolling_sum,
       count(*) OVER w7 AS rolling_n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w7 AS DOUBLE) / (count(*) OVER w7) AS rolling_avg,
       lag(value, 1) OVER wo AS prev_value,
       value - lag(value, 1) OVER wo AS delta
FROM events
WHERE event_type = 'purchase'
WINDOW w7 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       wo AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# ---------------------------------------------------------------------------
# q31 — INTERSECT / EXCEPT set operators (absent from the reference corpus;
# SURVEY §2.4 "no INTERSECT/EXCEPT"). Audience segmentation shape: users in
# both behavior sets vs. one set only. Distinct set semantics both sides.
# ---------------------------------------------------------------------------


def q31_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    # intersect/subtract are the DISTINCT set ops (SQL INTERSECT/EXCEPT);
    # exceptAll would only cancel per-occurrence multiplicities
    both = clickers.intersect(buyers).withColumn("segment", F.lit("click_and_buy"))
    click_only = clickers.subtract(buyers).withColumn("segment", F.lit("click_only"))
    buy_only = buyers.subtract(clickers).withColumn("segment", F.lit("buy_only"))
    return both.unionByName(click_only).unionByName(buy_only)


Q31_SQL = """
SELECT user_id, 'click_and_buy' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'click_only' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'buy_only' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'click')
"""


# ---------------------------------------------------------------------------
# q32 — PIVOT: per-user event-type matrix (count + exact sum per type).
# Spark's relational pivot with an EXPLICIT value list (an inferred list
# would mean an extra distinct-scan job and nondeterministic column order).
# Oracle: conditional aggregation with FILTER; empty cells are NULL in
# Spark's pivot, so counts go through nullif(.., 0).
# ---------------------------------------------------------------------------


def q32_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("amount"))
    )


def _pivot_sum(event_type: str) -> str:
    # FILTER binds to the aggregate, inside the outer CAST
    return (
        f"CAST(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = '{event_type}') AS DOUBLE)"
    )


Q32_SQL = f"""
SELECT user_id,
       nullif(count(*) FILTER (WHERE event_type = 'click'), 0) AS click_n,
       {_pivot_sum('click')} AS click_amount,
       nullif(count(*) FILTER (WHERE event_type = 'view'), 0) AS view_n,
       {_pivot_sum('view')} AS view_amount,
       nullif(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase_n,
       {_pivot_sum('purchase')} AS purchase_amount
FROM events
GROUP BY user_id
"""


SPECS: dict[str, QuerySpec] = {
    "q21_scalar_functions2": QuerySpec(q21_scalar_functions2, Q21_SQL, "scalar corpus #2"),
    "q22_provider_accounting": QuerySpec(q22_provider_accounting, Q22_SQL, "two-agg join accounting"),
    "q23_docs_embeddings_join": QuerySpec(q23_docs_embeddings_join, Q23_SQL, "quality-gated docs x embeddings"),
    "q24_enriched_rows": QuerySpec(q24_enriched_rows, Q24_SQL, "enrichment wide-row join"),
    "q25_top_parts_per_brand": QuerySpec(q25_top_parts_per_brand, Q25_SQL, "agg + ranked top-k per group"),
    "q26_correlated_subquery": QuerySpec(q26_correlated_subquery, Q26_SQL, "correlated scalar subquery"),
    "q27_asof_union": QuerySpec(q27_asof_union, Q27_SQL, "as-of join via union + running window"),
    "q28_rollup": QuerySpec(q28_rollup, Q28_SQL, "ROLLUP subtotals + GROUPING indicators"),
    "q29_percentiles": QuerySpec(q29_percentiles, Q29_SQL, "exact interpolated percentiles"),
    "q30_rolling_window": QuerySpec(q30_rolling_window, Q30_SQL, "rolling frame aggregates + lag deltas"),
    "q31_setops": QuerySpec(q31_setops, Q31_SQL, "INTERSECT/EXCEPT segmentation"),
    "q32_pivot": QuerySpec(q32_pivot, Q32_SQL, "relational PIVOT with explicit values"),
}
