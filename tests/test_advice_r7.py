"""Regression tests for the round-7 ADVICE findings: vacuum's txn-ledger
pruning resurrecting expired manifests (zombie versions), bloom-column
type validation (compute_blooms + the snapshot Data Source writer),
_merge_versioned_core losing manifest-pinned stats_cols when no props
file exists, and _may_match raising TypeError on incomparable probe
types instead of safely not pruning."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import merge_additive_versioned
from stellar_etl_airflow_spark.sinks import snapshots as S


def _counts(spark, path, version=None):
    return {
        r["k"]: r["n"]
        for r in S.read_snapshot(spark, path, version).collect()
    }


def test_vacuum_does_not_resurrect_expired_manifests(spark, tmp_path):
    """ADVICE r7 (medium): the txn-ledger pruning loop rewrote manifests
    of versions <= cutoff whose files vacuum had just deleted, recreating
    the manifest file — expired versions stayed readable (zombies) and
    violated the 'vacuumed-away versions raise on read' contract."""
    tbl = str(tmp_path / "t")
    for i in range(1, 5):  # v1..v4, each with a txn entry <= its version
        batch = spark.createDataFrame([(i, 1)], "k long, n long")
        merge_additive_versioned(
            spark, batch, tbl, keys=("k",), sum_cols=("n",),
            n_buckets=4, txn_id=f"batch-{i}",
        )
    assert S.latest_version(tbl) == 5  # v1 bootstrap + one per merge
    S.vacuum(tbl, keep_versions=1)
    # one vacuum suffices: v1-v4 manifests are gone from disk...
    on_disk = {
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(S._snap_dir(tbl), "v*.json"))
    }
    assert on_disk == {5}
    # ...and reading an expired version raises, never serves zombie data
    for v in (1, 2, 3, 4):
        with pytest.raises((FileNotFoundError, LookupError)):
            S.read_snapshot(spark, tbl, v)
    assert _counts(spark, tbl) == {1: 1, 2: 1, 3: 1, 4: 1}
    # the retained manifest's ledger kept only entries for live versions
    txns = S.read_manifest(tbl)["txns"]
    assert all(int(v) > 4 for v in txns.values()) and txns


def test_compute_blooms_rejects_unsupported_column_type(spark, tmp_path):
    """ADVICE r7: a float/timestamp bloom column silently recorded
    mismatched hashes (Spark CAST AS STRING vs Python str()) -> bloom
    false negatives -> wrongly pruned files. Now it raises."""
    p = str(tmp_path / "pq")
    spark.createDataFrame([(1, 2.5)], "id long, x double").write.parquet(p)
    files = [f for f in glob.glob(os.path.join(p, "*.parquet"))]
    with pytest.raises(TypeError, match="bloom column 'x'"):
        S.compute_blooms(spark, files, ["x"])
    # supported types still work
    blooms = S.compute_blooms(spark, files, ["id"])
    assert all("id" in cols for cols in blooms.values())


def test_snapshot_writer_rejects_unsupported_bloom_column(spark, tmp_path):
    """The Data Source writer path gets the same plan-time type gate."""
    from stellar_etl_airflow_spark.sources import snapshot_source

    snapshot_source.register(spark)
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.5)], "id long, x double")
    with pytest.raises(Exception, match="bloom column 'x'"):
        (df.write.format(snapshot_source.FORMAT_NAME).option("path", tbl)
         .option("bloom_cols", "x").mode("overwrite").save())


def test_merge_keeps_manifest_pinned_stats_cols(spark, tmp_path):
    """ADVICE r7: a table bootstrapped via overwrite_versioned(
    stats_cols=...) then merged (no props file pins) must keep its
    stats_cols — previously the first merge published stats_cols=[] and
    manifest pruning silently died."""
    tbl = str(tmp_path / "t")
    base = spark.createDataFrame([(i, i) for i in range(10)], "k long, n long")
    S.overwrite_versioned(spark, base, tbl, stats_cols=["k"])
    assert S.read_manifest(tbl)["stats_cols"] == ["k"]
    batch = spark.createDataFrame([(3, 5)], "k long, n long")
    merge_additive_versioned(spark, batch, tbl, keys=("k",), sum_cols=("n",), n_buckets=4)
    m = S.read_manifest(tbl)
    assert m["stats_cols"] == ["k"], "merge dropped the manifest-pinned stats_cols"
    assert m.get("stats"), "per-file stats vanished after merge"


def test_may_match_incomparable_types_never_prunes():
    """ADVICE r7: int probe vs string-recorded stats used to raise
    TypeError from deep inside prune_files; now the file safely survives
    (Spark's exact filter still applies)."""
    st = {"c": ["a", "z"]}
    assert S._may_match(st, {}, "c", ">", 5) is True
    assert S._may_match(st, {}, "c", "=", 5) is True
    assert S._may_match(st, {}, "c", "in", [5, 7]) is True
    # comparable probes still prune
    assert S._may_match({"c": [1, 3]}, {}, "c", ">", 5) is False
