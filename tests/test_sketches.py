"""Accuracy contract for the approximate sketch aggregates (q40): no value
oracle exists (sketch internals are engine-specific), so the bounds are
asserted against exact answers here."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_sketch_aggregates_within_bounds(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("pcts"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").alias("approx_pcts"),
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        # HLL++ with rsd=2%: generous 10% tolerance for small groups
        assert abs(a["approx_orders"] - e["orders"]) <= max(0.1 * e["orders"], 5)
        for pe, pa in zip(e["pcts"], a["approx_pcts"]):
            assert abs(pa - pe) <= 0.05 * abs(pe) + 1e-9
