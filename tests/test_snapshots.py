"""Manifest snapshot layer: versioned overwrite, time travel, zero-copy
clone, vacuum, and the staging-refresh integration (sinks/snapshots.py).

Reference behaviors being mirrored: zero-copy CLONE FOR SYSTEM_TIME AS OF
(/root/reference/dags/dag_stellar_dbt_staging_refresh.py:83-88)."""

from __future__ import annotations

import os

import pytest

from stellar_etl_airflow_spark.sinks import snapshots as S


def _ids(spark, path, version=None):
    return sorted(r[0] for r in S.read_snapshot(spark, path, version).select("id").collect())


def _write(spark, path, ids):
    return S.overwrite_versioned(
        spark, spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, v string"), path
    )


def test_versioned_overwrite_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "t")
    assert _write(spark, tbl, [1, 2]) == 1
    assert _write(spark, tbl, [3]) == 2
    assert _write(spark, tbl, [4, 5, 6]) == 3
    assert _ids(spark, tbl) == [4, 5, 6]
    assert _ids(spark, tbl, 1) == [1, 2]  # old versions stay readable
    assert _ids(spark, tbl, 2) == [3]


def test_snapshot_bootstraps_plain_directory(spark, tmp_path):
    tbl = str(tmp_path / "t")
    spark.createDataFrame([(7, "x")], "id long, v string").write.parquet(tbl)
    assert S.latest_version(tbl) is None
    assert S.snapshot(tbl) == 1
    assert _ids(spark, tbl) == [7]


def test_clone_is_zero_copy_and_diverges_cow(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(spark, src, [1, 2])
    S.clone(src, dst)
    # no data files under the clone — manifest only
    assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert _ids(spark, dst) == [1, 2]
    # clone diverges without touching the source
    _write(spark, dst, [9])
    assert _ids(spark, dst) == [9]
    assert _ids(spark, src) == [1, 2]
    # source evolves without touching the clone's pinned view
    _write(spark, src, [3])
    assert _ids(spark, dst, 1) == [1, 2]


def test_as_of_resolution(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _write(spark, tbl, [1])
    t1 = S.read_manifest(tbl, 1)["ts"]
    _write(spark, tbl, [2])
    assert S.as_of(tbl, t1) == 1
    assert S.as_of(tbl, t1 + 10**6) == 2
    with pytest.raises(LookupError):
        S.as_of(tbl, t1 - 10**6)


def test_vacuum_keeps_referenced_files_only(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _write(spark, tbl, [1])
    _write(spark, tbl, [2])
    _write(spark, tbl, [3])
    deleted = S.vacuum(tbl, keep_versions=2)
    assert deleted  # v1's files went away
    assert _ids(spark, tbl, 2) == [2]  # kept versions still read
    assert _ids(spark, tbl, 3) == [3]
    with pytest.raises(FileNotFoundError):
        S.read_manifest(tbl, 1)


def test_vacuum_never_deletes_clone_source_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write(spark, src, [1, 2])
    S.clone(src, dst)
    _write(spark, dst, [9])  # clone diverges; v1 still references src files
    S.vacuum(dst, keep_versions=1)
    assert _ids(spark, src) == [1, 2]  # source untouched
    assert _ids(spark, dst) == [9]


def test_staging_refresh_zero_copy_clone(spark, tmp_path):
    from stellar_etl_airflow_spark.operators.jobs import Warehouse, clone_dataset

    src = Warehouse(str(tmp_path / "prod"))
    dst = Warehouse(str(tmp_path / "staging"))
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(src.path("accounts"))
    spark.createDataFrame([(2, "b")], "id long, v string").write.parquet(src.path("trades"))
    results = clone_dataset(spark, src, dst, zero_copy=True)
    assert results == {"accounts": "ok", "trades": "ok"}
    assert _ids(spark, dst.path("accounts")) == [1]
    # zero-copy: staging holds manifests, not parquet
    assert not [f for f in os.listdir(dst.path("trades")) if f.endswith(".parquet")]


def test_fsck_repair_drops_missing_files(spark, tmp_path):
    """FSCK (r8): out-of-band file loss stops breaking reads — the
    repair drops vanished references (and their stats/DVs), keeps
    surviving metadata, and publishes a NEW version so the damaged one
    stays in history."""
    import os

    tbl = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 2 AS v").repartitionByRange(4, "id")
    S.overwrite_versioned(spark, df, tbl, stats_cols=["id"])
    m = S.read_manifest(tbl)
    victim = sorted(m["files"])[0]
    os.remove(victim)
    # dry run reports without touching anything
    assert S.fsck_repair(tbl, dry_run=True) == [victim]
    assert S.latest_version(tbl) == 1
    missing = S.fsck_repair(tbl)
    assert missing == [victim]
    assert S.latest_version(tbl) == 2
    m2 = S.read_manifest(tbl)
    assert victim not in m2["files"] and victim not in (m2.get("stats") or {})
    got = S.read_snapshot(spark, tbl).count()
    assert 0 < got < 100  # survivors readable, victim's rows gone
    # idempotent no-op when healthy
    assert S.fsck_repair(tbl) == []
    assert S.latest_version(tbl) == 2
