"""Regression tests for the code-review findings: template rendering,
bad-record skipping, translator terminators, scd2 duplicate guard,
salted-join mode guard, model-runner ref fallback."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.functions import translate_bq_sql
from stellar_etl_airflow_spark.models.runner import ModelRegistry
from stellar_etl_airflow_spark.operators import scd2 as S2
from stellar_etl_airflow_spark.operators.jobs import render_sql_template
from stellar_etl_airflow_spark.operators.skew import salted_join
from stellar_etl_airflow_spark.sources import ndjson

from . import fixtures as FX


def test_render_strips_qualified_prefix(spark):
    tpl = "SELECT * FROM {project_id}.{dataset_id}.history_assets WHERE batch_id = '{batch_id}'"
    out = render_sql_template(tpl, batch_id="b1", batch_run_date=datetime(2024, 1, 1))
    assert "history_assets" in out and "spark_catalog" not in out and ".." not in out
    # resolves against a bare temp view
    spark.range(3).createOrReplaceTempView("history_assets")
    spark.sql(out.replace("WHERE batch_id = 'b1'", "")).collect()


def test_translator_semicolon_terminator():
    out = translate_bq_sql("SELECT count(*) FROM proj.dset.accounts;")
    assert "proj.dset" not in out and "accounts;" in out


def test_bad_records_within_budget_skipped(spark, tmp_path):
    p = FX.write_ndjson(str(tmp_path / "n" / "f.txt"), FX.account_change_rows(), corrupt_line=True)
    df = ndjson.read_ndjson(spark, p, FX.ACCOUNTS_SCHEMA, max_bad_records=5)
    rows = df.collect()
    assert len(rows) == 6  # corrupt line skipped, not returned as nulls
    assert all(r["account_id"] is not None for r in rows)


def test_scd2_duplicate_key_guard(spark):
    snap = S2.scd2_init(spark.createDataFrame([("A", 1.0)], "k string, v double"), ("k",), datetime(2024, 1, 1))
    dup_state = spark.createDataFrame([("A", 1.0), ("A", 2.0)], "k string, v double")
    with pytest.raises(ValueError, match="duplicate natural keys"):
        S2.scd2_apply(snap, dup_state, ("k",), datetime(2024, 1, 2))


def test_salted_join_outer_guard(spark):
    f = spark.range(3).select(F.col("id").alias("k"))
    d = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(f, d, "k", how="full")
    # left join stays supported
    assert salted_join(f, d, "k", how="left").count() == 3


def test_model_ref_falls_back_to_catalog(spark):
    spark.range(4).withColumnRenamed("id", "n").createOrReplaceTempView("prebuilt_base")
    reg = ModelRegistry()

    @reg.model("top2", deps=())
    def top2(ctx):
        return ctx.ref("prebuilt_base").agg(F.count("*").alias("c"))

    out = reg.run(spark, "top2")
    assert out["top2"].collect()[0]["c"] == 4

    reg2 = ModelRegistry()

    @reg2.model("x2")
    def x2(ctx):
        return ctx.ref("definitely_missing_table")

    with pytest.raises(KeyError, match="not in this run"):
        reg2.run(spark, "x2")
