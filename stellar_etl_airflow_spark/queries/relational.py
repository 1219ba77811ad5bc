"""Relational operator corpus — one oracle-checked query per operator family
from SURVEY.md §2.4 (the reference's SQL surface), expressed Spark-first on
the driver's TPC-H-ish testdata.

Every query cites the reference construct it exercises (file:line into
/root/reference). DataFrame plans stay declarative: filters reach the
parquet scan (PushedFilters), projections prune columns, joins are left to
Catalyst/AQE with explicit ``broadcast()`` only where a side is known-small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import QuerySpec, dsum, dsum_sql, tables

# ---------------------------------------------------------------------------
# q01 — flagship: scan + filter + groupBy aggregate (map-side partial aggs).
# Mirrors the mart aggregates family (SURVEY §2.4 aggregations; dbt marts
# consumed at dags/queries/generate_avro/account_balances.sql:8-24).
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')}      AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {dsum_sql('l_quantity')} / count(*)      AS avg_qty,
       {dsum_sql('l_extendedprice')} / count(*) AS avg_price,
       {dsum_sql('l_discount')} / count(*)      AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — latest-state dedup: DENSE_RANK() OVER (PARTITION BY key ORDER BY
# ... DESC) = 1. The canonical current-state view pattern used by all 7
# v_*_current views (dags/ddls/queries/v_accounts_current.sql:30-33,87).
# ---------------------------------------------------------------------------


def q02_latest_state_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rank_number", F.dense_rank().over(w))
        .filter(F.col("rank_number") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


Q02_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, dense_rank() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rank_number
  FROM events
)
WHERE rank_number = 1
"""


# ---------------------------------------------------------------------------
# q03 — 3-way join + filter + agg + global sort (TPC-H Q3 shape). Mirrors
# the sensor-gated mart joins and global ORDER BY exports
# (dags/queries/generate_avro/accounts.sql:39).
# ---------------------------------------------------------------------------


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu, od, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        cu.filter(F.col("c_mktsegment") == "BUILDING")
        .join(od, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    )


Q03_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# q04 — oldest-wins ROW_NUMBER dedup (intra-batch dedup of history_assets,
# dags/queries/history_assets.sql:5-20: row_number ... ORDER BY batch ASC = 1).
# ---------------------------------------------------------------------------


def q04_oldest_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("dupe_count", F.row_number().over(w))
        .filter(F.col("dupe_count") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


Q04_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS dupe_count
  FROM events
)
WHERE dupe_count = 1
"""


# ---------------------------------------------------------------------------
# q05 — anti-join: "rows not already present" insert guard
# (dags/queries/history_assets.sql:29-45, LEFT JOIN ... WHERE x IS NULL).
# Spark expresses it directly as left_anti — no null-probe needed.
# ---------------------------------------------------------------------------


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa, li = tables(spark, sf_dir, "part", "lineitem")
    return (
        pa.join(li, pa.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand", "p_type")
    )


Q05_SQL = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# q06 — semi-join + OR-branch union: "keep trades whose asset is in the
# meaningful list, OR native" (dags/ddls/queries/v_relevant_asset_trades.sql:6-27).
# Here: events of users who made a purchase, OR signup events; the OR of a
# semi-join and a local predicate becomes two branches UNION DISTINCT.
# ---------------------------------------------------------------------------


def q06_semi_join_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    in_list = ev.join(purchasers, "user_id", "left_semi").select(*cols)
    signups = ev.filter(F.col("event_type") == "signup").select(*cols)
    return in_list.union(signups).distinct()


Q06_SQL = """
SELECT DISTINCT event_id, user_id, event_type, value
FROM (
  SELECT * FROM events e
  WHERE EXISTS (SELECT 1 FROM events p WHERE p.event_type = 'purchase' AND p.user_id = e.user_id)
  UNION ALL
  SELECT * FROM events WHERE event_type = 'signup'
)
"""


# ---------------------------------------------------------------------------
# q07 — as-of / range join against LEAD()-built validity windows. This is the
# price-attribution join in v_liquidity_pool_trade_volume.sql:31-54,88-95
# (valid_from <= t < valid_to, with the '2200-01-01' open-ended default and
# the fee-multiplier arithmetic). Purchases act as per-user price updates;
# clicks are the trades being priced. The price side is broadcast — at 100 TB
# the price dimension stays small, so the range join never shuffles the
# fact side by range key.
# ---------------------------------------------------------------------------


def q07_asof_price_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prices = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("valid_to_ts", F.coalesce(F.lead("ts", 1).over(w), F.lit("2200-01-01").cast("timestamp")))
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("value").alias("price"),
            F.col("ts").alias("valid_from_ts"),
            "valid_to_ts",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click")
    # shared fee arithmetic (functions/sharedsql.py, VERDICT r12 ask #5):
    # Catalyst inlines the SQL UDFs, so the plan is the same arithmetic
    from ..functions import sharedsql as SX

    SX.register_shared_functions(spark)
    fee_multiplier = SX.fee_multiplier(F.lit(30))
    amount = F.col("value") * F.coalesce(F.col("price"), F.lit(0.0))
    return (
        clicks.join(
            F.broadcast(prices),
            (clicks.user_id == prices.p_user_id)
            & (clicks.ts >= prices.valid_from_ts)
            & (clicks.ts < prices.valid_to_ts),
            "left",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "price",
            SX.trade_amount(amount, fee_multiplier).alias("trade_amount"),
            SX.fee_earned(amount, fee_multiplier).alias("fee_earned"),
        )
    )


Q07_SQL = """
WITH prices AS (
  SELECT user_id AS p_user_id, value AS price, ts AS valid_from_ts,
         coalesce(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                  TIMESTAMP '2200-01-01') AS valid_to_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id, c.ts, p.price,
       (c.value * coalesce(p.price, 0)) / (1 + 30 / 10000) AS trade_amount,
       (c.value * coalesce(p.price, 0))
         - (c.value * coalesce(p.price, 0)) / (1 + 30 / 10000) AS fee_earned
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN prices p
  ON c.user_id = p.p_user_id AND c.ts >= p.valid_from_ts AND c.ts < p.valid_to_ts
"""


# ---------------------------------------------------------------------------
# q08 — cross join of a 1-row "latest price" onto every row
# (v_liquidity_pool_value.sql:74-79: join ... on 1=1 with rank_nr=1 price).
# ---------------------------------------------------------------------------


def q08_cross_join_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    re_, ev = tables(spark, sf_dir, "region", "events")
    w = Window.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rank_nr", F.row_number().over(w))
        .filter(F.col("rank_nr") == 1)
        .select(F.col("value").alias("latest_price"))
    )
    return re_.crossJoin(F.broadcast(latest)).select("r_regionkey", "r_name", "latest_price")


Q08_SQL = """
SELECT r_regionkey, r_name, latest_price
FROM region
CROSS JOIN (
  SELECT value AS latest_price
  FROM (SELECT *, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rank_nr
        FROM events WHERE event_type = 'purchase')
  WHERE rank_nr = 1
)
"""


# ---------------------------------------------------------------------------
# q09 — scalar-function corpus: SPLIT[SAFE_OFFSET], CONCAT, TRIM, REGEXP_
# EXTRACT, DATE_TRUNC, EXTRACT(DAYOFWEEK) with the BQ 1=Sunday convention,
# TIMESTAMP_DIFF(ms), SAFE_DIVIDE, POW, CEILING, CASE WHEN
# (dags/queries/audit_log.sql:10-14,96-108,446-480; SURVEY §2.4 scalars).
# Spark 0-indexes split arrays (BQ SAFE_OFFSET(0) == [0]); DuckDB 1-indexes.
# ---------------------------------------------------------------------------


def q09_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (od,) = tables(spark, sf_dir, "orders")
    # F.get == BQ SAFE_OFFSET: NULL (not error) on out-of-bounds, 0-indexed.
    prio_num = F.get(F.split(F.col("o_orderpriority"), "-"), 0).cast("int")
    return od.select(
        "o_orderkey",
        prio_num.alias("priority_num"),
        F.get(F.split(F.col("o_orderpriority"), "-"), 9).alias("oob_is_null"),
        F.concat(F.col("o_orderstatus"), F.lit("/"), F.trim(F.col("o_orderpriority"))).alias("status_priority"),
        F.regexp_extract(F.col("o_orderpriority"), "([A-Z]+)", 1).alias("priority_word"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.dayofweek(F.col("o_orderdate")).alias("order_dow"),
        (
            F.unix_millis(F.col("o_orderdate").cast("timestamp"))
            - F.unix_millis(F.date_trunc("month", F.col("o_orderdate")).cast("timestamp"))
        ).alias("ms_into_month"),
        (F.col("o_totalprice") / F.nullif(prio_num - 1, F.lit(0))).alias("safe_divided"),
        F.pow(F.lit(2), prio_num).alias("pow2"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_k_ceil"),
        F.when(F.col("o_orderstatus") == "F", "finished").otherwise("open").alias("status_word"),
    )


Q09_SQL = """
SELECT o_orderkey,
       CAST(string_split(o_orderpriority, '-')[1] AS INT)  AS priority_num,
       string_split(o_orderpriority, '-')[10]              AS oob_is_null,
       o_orderstatus || '/' || trim(o_orderpriority)       AS status_priority,
       regexp_extract(o_orderpriority, '([A-Z]+)', 1)      AS priority_word,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       dayofweek(o_orderdate) + 1                          AS order_dow,
       datediff('millisecond', date_trunc('month', o_orderdate), o_orderdate) AS ms_into_month,
       o_totalprice / nullif(CAST(string_split(o_orderpriority, '-')[1] AS INT) - 1, 0) AS safe_divided,
       pow(2, CAST(string_split(o_orderpriority, '-')[1] AS INT)) AS pow2,
       CAST(ceil(o_totalprice / 1000) AS BIGINT)           AS price_k_ceil,
       CASE WHEN o_orderstatus = 'F' THEN 'finished' ELSE 'open' END AS status_word
FROM orders
"""


# ---------------------------------------------------------------------------
# q10 — JSON extraction: JSON_EXTRACT_SCALAR -> get_json_object
# (audit_log.sql:11,22-35; details_json columns, SURVEY §1.2 JSON type).
# ---------------------------------------------------------------------------


def q10_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).alias("k_mod10"),
        F.get_json_object(F.col("props"), "$.missing").alias("missing_is_null"),
    )


Q10_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k_value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
       json_extract_string(props, '$.missing')                AS missing_is_null
FROM events
"""


# ---------------------------------------------------------------------------
# q11 — SCD-2 validity-window construction with LEAD(ts, 1, default)
# (v_liquidity_pool_trade_volume.sql:37-41; snapshots SURVEY §2.5).
# ---------------------------------------------------------------------------


def q11_validity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("value").alias("price"),
            F.col("ts").alias("valid_from_ts"),
            F.coalesce(F.lead("ts", 1).over(w), F.lit("2200-01-01").cast("timestamp")).alias("valid_to_ts"),
            F.when(F.lead("ts", 1).over(w).isNull(), True).otherwise(False).alias("is_current"),
        )
    )


Q11_SQL = """
SELECT user_id, value AS price, ts AS valid_from_ts,
       coalesce(lead(ts, 1) OVER w, TIMESTAMP '2200-01-01') AS valid_to_ts,
       CASE WHEN lead(ts, 1) OVER w IS NULL THEN true ELSE false END AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# ---------------------------------------------------------------------------
# q12 — OHLC rollup: open/close via argmin/argmax on time, high/low via
# min/max (the ohlc dbt mart, SURVEY §2.4 aggregations; task_sla.ohlc).
# min_by/max_by stay JVM-side and avoid a window + filter double-scan.
# ---------------------------------------------------------------------------


def q12_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            dsum(F.col("value")).alias("volume"),
        )
    )


Q12_SQL = f"""
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       arg_min(value, ts)  AS open,
       max(value)          AS high,
       min(value)          AS low,
       arg_max(value, ts)  AS close,
       count(*)            AS n_trades,
       {dsum_sql('value')} AS volume
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id, date_trunc('day', ts)
"""


# ---------------------------------------------------------------------------
# q13 — ordered ARRAY_AGG rendered to a string: ARRAY_AGG(x ORDER BY y)
# (audit_log.sql:366-391). Rendered with array_join so the value hash is
# engine-stable (list stringification differs across engines).
# ---------------------------------------------------------------------------


def q13_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("l_partkey")), lambda v: v.cast("string")), ","
        ).alias("partkeys"),
        F.size(F.collect_list("l_partkey")).alias("n_parts"),
    )


Q13_SQL = """
SELECT l_orderkey,
       string_agg(l_partkey::VARCHAR, ',' ORDER BY l_partkey) AS partkeys,
       CAST(count(l_partkey) AS INT)                          AS n_parts
FROM lineitem
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# q14 — UNION ALL of tagged branches (clone-result reporting,
# dag_stellar_dbt_staging_refresh.py:163-171).
# ---------------------------------------------------------------------------


def q14_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    (od,) = tables(spark, sf_dir, "orders")
    fulfilled = od.filter(F.col("o_orderstatus") == "F").select(
        F.lit("fulfilled").alias("branch"), F.col("o_orderkey"), F.col("o_totalprice")
    )
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("branch"), F.col("o_orderkey"), F.col("o_totalprice")
    )
    return fulfilled.union(urgent)


Q14_SQL = """
SELECT 'fulfilled' AS branch, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT 'urgent' AS branch, o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# ---------------------------------------------------------------------------
# q15 — multi-way join with a multi-column equality (TPC-H Q5 shape): the
# 6-way JOIN ... USING chain of audit_log.sql:712-717 and the multi-key
# joins of history_assets.sql:35-44. region/nation are broadcast — on a
# 1000-executor cluster only the two fact tables shuffle.
# ---------------------------------------------------------------------------


def q15_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    re_, na, cu, od, li, su = tables(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey))
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q15_SQL = f"""
SELECT r_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# q16 — GROUP BY-all-columns as DISTINCT (v_accounts_current.sql:37-61 does
# this before the window; every v_*_current view repeats it).
# ---------------------------------------------------------------------------


def q16_distinct_groupall(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


Q16_SQL = "SELECT user_id, event_type FROM events GROUP BY user_id, event_type"


# ---------------------------------------------------------------------------
# q17 — MERGE apply-changes semantics as a batch query: latest change wins;
# a terminal 'deleted' change removes the key
# (build_apply_gcs_changes_to_bq_task.py:116-149: WHEN MATCHED AND s.deleted
# THEN DELETE). Here event_type='error' plays the deleted flag.
# ---------------------------------------------------------------------------


def q17_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", F.col("event_type").alias("last_event_type"), F.col("value").alias("last_value"))
    )


Q17_SQL = """
SELECT user_id, event_type AS last_event_type, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
"""


# ---------------------------------------------------------------------------
# q18 — GENERATE_ARRAY + UNNEST -> sequence() + explode (per-minute slot
# buckets, audit_log.sql:466-475). The higher-order path never leaves the JVM.
# ---------------------------------------------------------------------------


def q18_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = tables(spark, sf_dir, "lineitem")
    n_slots = F.least(F.col("l_quantity"), F.lit(3.0)).cast("int")
    return (
        li.select("l_orderkey", F.explode(F.sequence(F.lit(1), n_slots)).alias("slot"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_slots"), F.sum("slot").alias("slot_sum"))
    )


Q18_SQL = """
SELECT l_orderkey, count(*) AS n_slots, CAST(sum(slot) AS BIGINT) AS slot_sum
FROM (
  SELECT l_orderkey, unnest(generate_series(1, CAST(least(l_quantity, 3.0) AS INT))) AS slot
  FROM lineitem
)
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# q19 — sessionization: gap > 30 min starts a new session; session id is a
# running sum of boundary flags. Cumulative-window equivalent of the
# reference's micro-batch windowing (SURVEY §2.4 streaming-only concepts).
# ---------------------------------------------------------------------------


def q19_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = tables(spark, sf_dir, "events")
    # Gap test is a full-precision timestamp comparison (ts > prev + 30 min)
    # mirrored exactly in the oracle SQL — never truncate-then-subtract
    # (unix_millis) on one side and boundary-count (datediff) on the other:
    # sub-ms fractions straddling the threshold would flip is_new.
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts", 1).over(w)
    is_new = F.when(prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .select("user_id", "event_id", "ts", "session_id")
    )


Q19_SQL = """
SELECT user_id, event_id, ts,
       -- CAST: DuckDB SUM over integers yields HUGEINT, which pandas can
       -- only hold as float64 (1.0 vs Spark's bigint 1 -> driver hash
       -- mismatch); BIGINT round-trips as int64 on both engines.
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT *, CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                   OR ts > lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM events
)
"""


# ---------------------------------------------------------------------------
# q20 — export projection: half-open time slice on the partition-style
# column + explicit column list + ORDER BY, the exact Avro-export query
# shape (dags/queries/generate_avro/accounts.sql:8-39,
# build_bq_generate_avro_job_task.py:20-35).
# ---------------------------------------------------------------------------


def q20_export_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    (od,) = tables(spark, sf_dir, "orders")
    t0 = F.lit("1997-01-01").cast("timestamp")
    t1 = F.lit("1998-01-01").cast("timestamp")
    return (
        od.filter((F.col("o_orderdate") >= t0) & (F.col("o_orderdate") < t1))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey")
    )


Q20_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY o_orderdate, o_orderkey
"""


SPECS: dict[str, QuerySpec] = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "scan+filter+groupBy agg (flagship)"),
    "q02_latest_state_dedup": QuerySpec(q02_latest_state_dedup, Q02_SQL, "dense_rank latest-state dedup"),
    "q03_shipping_priority": QuerySpec(q03_shipping_priority, Q03_SQL, "3-way join + agg + sort"),
    "q04_oldest_wins_dedup": QuerySpec(q04_oldest_wins_dedup, Q04_SQL, "row_number oldest-wins dedup"),
    "q05_anti_join": QuerySpec(q05_anti_join, Q05_SQL, "left anti join"),
    "q06_semi_join_union": QuerySpec(q06_semi_join_union, Q06_SQL, "left semi join + union distinct"),
    "q07_asof_price_join": QuerySpec(q07_asof_price_join, Q07_SQL, "as-of range join on validity windows"),
    "q08_cross_join_latest": QuerySpec(q08_cross_join_latest, Q08_SQL, "cross join 1-row dim"),
    "q09_scalar_functions": QuerySpec(q09_scalar_functions, Q09_SQL, "scalar function corpus"),
    "q10_json_extract": QuerySpec(q10_json_extract, Q10_SQL, "JSON extraction"),
    "q11_validity_windows": QuerySpec(q11_validity_windows, Q11_SQL, "lead() SCD-2 windows"),
    "q12_ohlc": QuerySpec(q12_ohlc, Q12_SQL, "OHLC argmin/argmax rollup"),
    "q13_array_agg_ordered": QuerySpec(q13_array_agg_ordered, Q13_SQL, "ordered array_agg"),
    "q14_union_branches": QuerySpec(q14_union_branches, Q14_SQL, "union all branches"),
    "q15_multiway_join": QuerySpec(q15_multiway_join, Q15_SQL, "6-way join w/ broadcast dims"),
    "q16_distinct_groupall": QuerySpec(q16_distinct_groupall, Q16_SQL, "group-by-all distinct"),
    "q17_apply_changes": QuerySpec(q17_apply_changes, Q17_SQL, "MERGE apply-changes semantics"),
    "q18_sequence_explode": QuerySpec(q18_sequence_explode, Q18_SQL, "sequence + explode"),
    "q19_sessionize": QuerySpec(q19_sessionize, Q19_SQL, "gap sessionization"),
    "q20_export_slice": QuerySpec(q20_export_slice, Q20_SQL, "export time-slice projection"),
}
