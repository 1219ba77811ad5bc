"""Warehouse catalog registration + salted-join equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.catalog import load_warehouse
from stellar_etl_airflow_spark.operators.batch import plan_batch
from stellar_etl_airflow_spark.operators.ingest import Warehouse, ingest_batch
from stellar_etl_airflow_spark.operators.skew import salted_join

from . import fixtures as FX


def test_load_warehouse(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    src = FX.write_ndjson(str(tmp_path / "in" / "accounts.txt"), FX.account_change_rows())
    w = plan_batch("r1", datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 10, 10))
    ingest_batch(spark, wh, "accounts", src, FX.ACCOUNTS_SCHEMA, w)
    names = load_warehouse(spark, wh, include_meta=True)
    assert set(names) == {"accounts", "batch_runs"}
    assert spark.sql("SELECT count(*) c FROM accounts").collect()[0]["c"] == 6
    assert spark.sql("SELECT count(*) c FROM batch_runs").collect()[0]["c"] == 1
    assert "_p" not in spark.table("accounts").columns


def test_salted_join_equivalence(spark):
    # heavily skewed fact side: 900 rows on key 1, 100 spread
    facts = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id") % 50).cast("long").alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val"))
    plain = facts.join(dim, "k").select("fact_id", "dim_val")
    salted = salted_join(facts, dim, "k", n_salts=8).select("fact_id", "dim_val")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_outer_and_rejected_sides(spark):
    """Fact-preserving sides only: left outer keeps unmatched facts exactly
    once (not once per salt); right/full are rejected with a clear error
    because the exploded dim side would null-pad one row PER SALT."""
    import pytest

    facts = spark.range(100).select(
        (F.col("id") % 60).alias("k"), F.col("id").alias("fact_id")
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val"))
    plain = facts.join(dim, "k", "left").select("fact_id", "dim_val")
    salted = salted_join(facts, dim, "k", n_salts=8, how="left").select("fact_id", "dim_val")
    assert plain.count() == salted.count() == 100
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(facts, dim, "k", how=how)
