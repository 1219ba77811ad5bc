"""Physical-layout proof: the writer's (month, batch_id) partitioning
actually prunes — a month-filtered read touches only that month's
partition directories (the reference's partition-pruning discipline,
build_delete_data_task.py:13-14)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks import writer


def test_month_partition_pruning(spark, tmp_path):
    rows = [
        (i, datetime(2024, 1 + (i % 3), 1) + timedelta(hours=i), float(i)) for i in range(30)
    ]
    df = (
        spark.createDataFrame(rows, "id long, batch_run_date timestamp, v double")
        .withColumn("batch_id", F.lit("b1"))
    )
    path = str(tmp_path / "t")
    writer.write_table(df, path, "batch_run_date", "month")

    read = spark.read.parquet(path).filter(F.col(writer.PART_COL) == "2024-02")
    assert read.count() == 10

    buf = io.StringIO()
    with redirect_stdout(buf):
        read.explain("formatted")
    plan = buf.getvalue()
    # partition filter applied at scan, not post-scan
    assert "PartitionFilters" in plan and "2024-02" in plan
