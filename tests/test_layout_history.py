"""Round-5 additions: snapshot-table history introspection
(sinks/snapshots.py::describe_history/snapshot_files) and Z-order
clustering for data skipping (operators/layout.py)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.layout import zorder_write, zvalue
from stellar_etl_airflow_spark.sinks.snapshots import (
    describe_history,
    overwrite_versioned,
    snapshot_files,
    vacuum,
)


def test_describe_history_tracks_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    overwrite_versioned(spark, spark.range(10), path)
    overwrite_versioned(spark, spark.range(20), path)
    overwrite_versioned(spark, spark.range(5), path)
    hist = {r["version"]: r for r in describe_history(spark, path).collect()}
    assert sorted(hist) == [1, 2, 3]
    assert hist[3]["is_current"] and not hist[1]["is_current"] and not hist[2]["is_current"]
    # versioned overwrite replaces every file: adds = new files, removes = old
    assert hist[2]["n_removed"] == hist[1]["n_files"]
    assert hist[2]["n_added"] == hist[2]["n_files"]
    assert all(r["total_bytes"] > 0 for r in hist.values())
    files = snapshot_files(spark, path).collect()
    assert len(files) == hist[3]["n_files"]
    assert all(f["size_bytes"] > 0 and f["file"].endswith(".parquet") for f in files)
    # history survives vacuum for retained versions only
    vacuum(path, keep_versions=1)
    kept = [r["version"] for r in describe_history(spark, path).collect()]
    assert kept == [3]


def test_zvalue_validation_and_nulls(spark):
    df = spark.createDataFrame([(1.0, None), (2.0, 5.0)], "x double, y double")
    with pytest.raises(ValueError, match="1..7 columns"):
        zvalue(df, [])
    with pytest.raises(ValueError, match="bits"):
        zvalue(df, ["x"], bits=0)
    rows = df.withColumn("z", zvalue(df, ["x", "y"], bits=2)).collect()
    assert all(r["z"] is not None and r["z"] >= 0 for r in rows)


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) per parquet file from footer stats — what a reader's
    file/row-group skipping sees."""
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_write_enables_multi_column_skipping(spark, tmp_path):
    """The data-skipping proof: after zorder_write on (x, y), the fraction
    of files whose footer [min,max] intersects a small box predicate on
    BOTH columns is far below 100% — while a single-column sort leaves the
    trailing column's per-file range full-width (no skipping on y)."""
    n = 40_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1000).alias("x"),
        (F.hash(F.col("id") + 7) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "sorted_x")
    zorder_write(df, zdir, ["x", "y"], bits=5, target_files=64)
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def overlap_frac(path: str, col: str, lo: int, hi: int) -> float:
        ranges = _file_ranges(path, col)
        hit = sum(1 for (flo, fhi) in ranges if fhi >= lo and flo <= hi)
        return hit / len(ranges)

    # one-eighth-width predicate on each clustered column separately:
    # x-sorted prunes x hard but CANNOT prune y (every file spans full
    # y-width); z-order prunes meaningfully on BOTH — that trade is the
    # whole point of multi-dimensional clustering
    z_x = overlap_frac(zdir, "x", -500, -251)
    z_y = overlap_frac(zdir, "y", -500, -251)
    s_x = overlap_frac(sdir, "x", -500, -251)
    s_y = overlap_frac(sdir, "y", -500, -251)
    assert s_y == 1.0, s_y  # the single-column layout's blind spot
    assert z_x <= 0.5 and z_y <= 0.5, (z_x, z_y)  # measured ~0.31 / 0.25
    assert s_x < z_x  # sort leader stays sharper — expected, not a defect
    # and the rewrite is lossless
    assert spark.read.parquet(zdir).count() == n
    back = spark.read.parquet(zdir).agg(F.sum("payload")).first()[0]
    assert back == n * (n - 1) // 2


def test_zvalue_wide_and_typed_columns(spark):
    """Regressions from review: (a) bit positions >= 31 must not wrap a
    32-bit int (4+ cols x 8 bits reaches position 31+), (b) timestamp/
    date/boolean columns must bucket via their double view, (c) strings
    are rejected with a clear error."""
    df = spark.range(2000).selectExpr(
        "CAST(id % 97 AS LONG) AS a",
        "CAST(id % 89 AS DOUBLE) AS b",
        "CAST(id % 83 AS INT) AS c",
        "CAST(id % 79 AS LONG) AS d",
        "CAST(id % 73 AS LONG) AS e",
        "timestamp_seconds(1700000000 + id * 60) AS ts",
        "DATE '2024-01-01' + make_interval(0, 0, 0, CAST(id % 300 AS INT)) AS dt",
        "id % 2 = 0 AS flag",
        "CAST(id AS STRING) AS s",
    )
    rows = df.withColumn("z", zvalue(df, ["a", "b", "c", "d", "e"], bits=8)).select("z").collect()
    zs = [r["z"] for r in rows]
    assert all(z >= 0 for z in zs), "negative z-value: 32-bit shiftleft wrap"
    assert max(zs) >= (1 << 31), "wide interleave never reached high bit positions"
    assert len(set(zs)) > 100
    typed = df.withColumn("z", zvalue(df, ["ts", "dt", "flag"], bits=4)).select("z").collect()
    assert all(r["z"] is not None and r["z"] >= 0 for r in typed)
    assert len({r["z"] for r in typed}) > 10
    import pytest

    with pytest.raises(ValueError, match="unsupported type"):
        zvalue(df, ["s"])


def test_bucket_binary_search_equals_brute_count(spark):
    """The r9 codegen binary-search bucket must equal the definitional
    'count of boundaries <= value' for every value position: below,
    equal-to, between, above, duplicates among boundaries, and NULL."""
    from stellar_etl_airflow_spark.operators.layout import _bucket_col

    bounds = [1.0, 1.0, 2.5, 2.5, 2.5, 7.0, 9.0]  # deliberately duplicated
    vals = [0.0, 1.0, 1.5, 2.5, 3.0, 7.0, 8.0, 9.0, 100.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["b"] for r in df.select(_bucket_col(F.col("v"), bounds).alias("b")).collect()
    ]
    # NULL descends with every comparison NULL -> bucket 0, the same
    # NULLS-FIRST placement the old size(filter(...)) form produced
    want = [sum(1 for b in bounds if b <= v) if v is not None else 0 for v in vals]
    assert got == want, (got, want)


def test_bucket_search_random_boundaries(spark):
    """Randomized sweep (fixed seed): 64 boundary arrays x 32 probe
    values, binary search == brute count everywhere."""
    import random

    from stellar_etl_airflow_spark.operators.layout import _bucket_col

    rng = random.Random(17)
    rows, cols = [], []
    for t in range(8):
        n = rng.choice([1, 3, 7, 15, 31, 255])
        bounds = sorted(round(rng.uniform(-5, 5), 2) for _ in range(n))
        vals = [round(rng.uniform(-6, 6), 2) for _ in range(32)] + bounds[:4]
        rows.append((t, bounds, vals))
    df = spark.createDataFrame(
        [(t, v) for t, _b, vs in rows for v in vs], "t int, v double"
    )
    for t, bounds, _vs in rows:
        got = {
            (r["v"], r["b"])
            for r in df.where(F.col("t") == t)
            .select("v", _bucket_col(F.col("v"), bounds).alias("b"))
            .collect()
        }
        for v, b in got:
            assert b == sum(1 for x in bounds if x <= v), (t, v, b)
