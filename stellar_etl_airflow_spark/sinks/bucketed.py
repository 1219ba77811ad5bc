"""Bucketed tables: shuffle-free co-located joins.

BigQuery clustering gives the reference data-skipping; Spark bucketing
additionally gives CO-LOCATION — two tables bucketed the same way join
without any exchange, the decisive optimization for repeated large-fact
joins at 100 TB (SURVEY §4; guide: "bucketing ... co-locate without a
shuffle"). Bucketed writes must go through the session catalog
(``saveAsTable``), so this module manages warehouse-scoped table names
rather than bare paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with NO Exchange on either
    side (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
