"""Bucketed co-located join: no Exchange in the physical plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks.bucketed import bucketed_join, write_bucketed


def _drop(spark, name):
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{loc}/{name}", ignore_errors=True)


def test_bucketed_join_no_shuffle(spark):
    _drop(spark, "bt_orders")
    _drop(spark, "bt_lines")
    orders = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("o_val"))
    lines = spark.range(3000).select((F.col("id") % 1000).alias("k"), F.col("id").alias("l_val"))
    write_bucketed(orders, "bt_orders", ("k",), n_buckets=8, sort_cols=("k",))
    write_bucketed(lines, "bt_lines", ("k",), n_buckets=8, sort_cols=("k",))

    # small fixtures would go broadcast; force the merge-join path the way
    # a large-fact x large-fact join would plan it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bt_orders", "bt_lines", ["k"])
        assert joined.count() == 3000

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # the whole point: both sides read pre-bucketed, no shuffle exchange
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # same join un-bucketed DOES shuffle (sanity baseline)
        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            orders.join(lines, "k").explain("formatted")
        assert "Exchange" in buf2.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
