"""Additive MVCC merge: incremental aggregate maintenance."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import merge_additive_versioned
from stellar_etl_airflow_spark.sinks.snapshots import read_snapshot


def test_merge_additive_matches_full_recompute(spark, tmp_path):
    path = str(tmp_path / "agg")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from stellar_etl_airflow_spark.session import normalize_nanos

    ev = normalize_nanos(ev).select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        F.col("value").cast("decimal(38,6)").alias("v"),
        "event_id",
    )
    # three disjoint batches by event_id residue -- arrival order arbitrary
    batches = [ev.filter(F.col("event_id") % 3 == r) for r in (2, 0, 1)]
    for b in batches:
        agg = b.groupBy("user_id", "day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )
        v, touched = merge_additive_versioned(
            spark, agg, path, keys=("user_id", "day"), sum_cols=("n", "total"), n_buckets=8
        )
        assert touched
    final = read_snapshot(spark, path).select("user_id", "day", "n", "total")
    full = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    assert final.count() == full.count()
    assert final.exceptAll(full).count() == 0 and full.exceptAll(final).count() == 0
    # time travel: the first batch's publication (v1 is the empty
    # bootstrap manifest, v2 the first merge) holds exactly batch 1's agg
    first = read_snapshot(spark, path, version=2).select("user_id", "day", "n", "total")
    b1 = batches[0].groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    assert first.exceptAll(b1).count() == 0 and b1.exceptAll(first).count() == 0


def test_merge_additive_rejects_extra_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, 2, 3)], "k long, n long, junk long")
    with pytest.raises(ValueError, match="exactly keys"):
        merge_additive_versioned(spark, df, str(tmp_path / "x"), keys=("k",), sum_cols=("n",))
