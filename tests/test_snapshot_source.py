"""Batch snapshot Data Source (sources/snapshot_source.py): Catalyst
filter pushdown -> manifest file pruning (stats + blooms) -> pyarrow
row-group pruning, with exact results (Spark re-evaluates every
filter)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.sources import snapshot_source


def _key(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


def _load(spark, path, **opts):
    snapshot_source.register(spark)
    r = spark.read.format(snapshot_source.FORMAT_NAME).option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_table_and_matches_read_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    ).repartitionByRange(6, "k")
    S.overwrite_versioned(spark, df, path, stats_cols=("k",))
    got = _load(spark, path)
    assert sorted(r["k"] for r in got.collect()) == list(range(500))
    assert set(got.columns) == {"k", "v", "name"}


def test_catalyst_filters_prune_files(spark, tmp_path):
    """A plain .where() on the loaded frame must reach pushFilters and
    shrink the partition count to the surviving files."""
    path = str(tmp_path / "t")
    df = spark.range(1000).select(F.col("id").alias("k")).repartitionByRange(8, "k")
    S.overwrite_versioned(spark, df, path, stats_cols=("k",))

    full = _load(spark, path)
    assert full.rdd.getNumPartitions() == len(S.read_manifest(path)["files"])

    sel = _load(spark, path).where(F.col("k") == 500)
    assert sel.collect() == [(500,)]
    # partition count == files surviving the manifest prune (1 range file)
    assert sel.rdd.getNumPartitions() < full.rdd.getNumPartitions()
    assert sel.rdd.getNumPartitions() == len(
        S.prune_files(S.read_manifest(path), [("k", "=", 500)])
    )

    rng = _load(spark, path).where((F.col("k") >= 100) & (F.col("k") < 300))
    assert rng.count() == 200

    inl = _load(spark, path).where(F.col("k").isin([5, 995]))
    assert sorted(r["k"] for r in inl.collect()) == [5, 995]
    assert inl.rdd.getNumPartitions() <= 2


def test_bloom_pushdown_on_hashed_key(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.md5(F.col("id").cast("string")).alias("h"), F.col("id").alias("v")
    ).repartition(6, "h")
    S.overwrite_versioned(spark, df, path, bloom_cols=("h",))
    n_files = len(S.read_manifest(path)["files"])

    sel = _load(spark, path).where(F.col("h") == _key(123))
    assert [r["v"] for r in sel.collect()] == [123]
    assert sel.rdd.getNumPartitions() < n_files  # blooms pruned files

    miss = _load(spark, path).where(F.col("h") == _key(10**6))
    assert miss.count() == 0


def test_time_travel_and_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite_versioned(
        spark, spark.range(3).select(F.col("id").alias("k")), path
    )
    v1 = S.latest_version(path)
    S.overwrite_versioned(
        spark,
        spark.range(5).select(F.col("k"), F.lit("x").alias("extra"))
        if False
        else spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("extra")),
        path,
    )
    old = _load(spark, path, version=str(v1))
    assert old.columns == ["k"] and old.count() == 3
    new = _load(spark, path)
    assert set(new.columns) == {"k", "extra"} and new.count() == 5


def test_unsafe_filter_types_fall_back_to_spark(spark, tmp_path):
    """A filter whose value can't compare against JSON stats (e.g.
    timestamp) must not break results — the source keeps every file and
    Spark evaluates the predicate."""
    from datetime import datetime

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + i)) for i in range(5)], "k long, ts timestamp"
    )
    S.overwrite_versioned(spark, df, path, stats_cols=("k", "ts"))
    got = _load(spark, path).where(F.col("ts") > F.lit(datetime(2024, 1, 3)))
    assert sorted(r["k"] for r in got.collect()) == [3, 4]


def test_reader_timestamp_as_of(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF through the connector: timestampAsOf
    resolves the largest version published at or before the timestamp."""
    import time as _time

    from stellar_etl_airflow_spark.sinks import snapshots as S

    path = str(tmp_path / "t")
    S.overwrite_versioned(spark, spark.range(0, 5).select("id"), path)
    t_between = _time.time()
    _time.sleep(0.05)
    S.overwrite_versioned(spark, spark.range(0, 9).select("id"), path)

    got = (
        spark.read.format("snapshot").option("path", path)
        .option("timestampAsOf", str(t_between)).load()
    )
    assert got.count() == 5
    # latest without the option
    assert spark.read.format("snapshot").option("path", path).load().count() == 9
    import pytest as _pytest

    with _pytest.raises(Exception, match="version or timestampAsOf"):
        (
            spark.read.format("snapshot").option("path", path)
            .option("timestampAsOf", str(t_between)).option("version", "1")
            .load().collect()
        )
