"""Bucketed range join: equivalence with the naive range join across
bucket widths, left semantics, and open-ended interval clamping."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.rangejoin import bucketed_range_join


@pytest.fixture(scope="module")
def data(spark):
    t0 = datetime(2024, 3, 1)
    facts = spark.createDataFrame(
        [("k", t0 + timedelta(hours=h), h) for h in range(0, 72, 5)] + [("lonely", t0, 99)],
        "key string, ts timestamp, fact_id int",
    )
    intervals = spark.createDataFrame(
        [
            ("k", 1.0, t0, t0 + timedelta(hours=30)),
            ("k", 2.0, t0 + timedelta(hours=30), t0 + timedelta(hours=31)),  # sub-bucket window
            ("k", 3.0, t0 + timedelta(hours=31), datetime(9999, 12, 31)),  # open-ended
            ("other", 9.0, t0, datetime(9999, 12, 31)),
        ],
        "key string, price double, valid_from_ts timestamp, valid_to_ts timestamp",
    )
    return facts, intervals


def _naive(facts, intervals, how):
    f, iv = facts.alias("f"), intervals.alias("iv")
    return f.join(
        iv,
        (F.col("f.key") == F.col("iv.key"))
        & (F.col("f.ts") >= F.col("iv.valid_from_ts"))
        & (F.col("f.ts") < F.col("iv.valid_to_ts")),
        how,
    ).select(F.col("f.fact_id"), F.col("iv.price"))


@pytest.mark.parametrize("bucket", ["1 hour", "6 hours", "1 day"])
def test_bucketed_equals_naive_inner(spark, data, bucket):
    facts, intervals = data
    got = sorted(
        (r["fact_id"], r["price"])
        for r in bucketed_range_join(facts, intervals, "key", bucket=bucket).collect()
    )
    want = sorted((r["fact_id"], r["price"]) for r in _naive(facts, intervals, "inner").collect())
    assert got == want and len(want) > 0


def test_bucketed_left_keeps_unmatched(spark, data):
    facts, intervals = data
    got = {
        r["fact_id"]: r["price"]
        for r in bucketed_range_join(facts, intervals, "key", bucket="1 day", how="left").collect()
    }
    want = {r["fact_id"]: r["price"] for r in _naive(facts, intervals, "left").collect()}
    assert got == want
    assert got[99] is None  # key with no intervals survives with NULL


def test_bucketed_rejects_unknown_how(spark, data):
    facts, intervals = data
    with pytest.raises(ValueError, match="inner/left"):
        bucketed_range_join(facts, intervals, "key", how="full")
