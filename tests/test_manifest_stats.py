"""Manifest-level file statistics + metadata-only pruning (r7):
Iceberg's manifest-stats idea on the snapshot log. Writers record
per-file [min, max] for pinned columns; scan_snapshot drops files from
the MANIFEST alone (zero footer opens at planning time), then applies
the same predicates as real filters so results are exact regardless of
stats coverage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import apply_changes
from stellar_etl_airflow_spark.sinks import snapshots as S


def _ranged_df(spark, n=1000, parts=8):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.concat(F.lit("u"), F.format_string("%04d", F.col("id"))).alias("name"),
        )
        .repartitionByRange(parts, "k")
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stats_recorded_and_pruned_scan_matches_full(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite_versioned(spark, _ranged_df(spark), path, stats_cols=("k", "name"))
    m = S.read_manifest(path)
    assert m["stats_cols"] == ["k", "name"]
    assert len(m["files"]) >= 4
    assert set(m["stats"]) == set(m["files"])
    for st in m["stats"].values():
        assert set(st) == {"k", "name"} and st["k"][0] <= st["k"][1]

    full = S.read_snapshot(spark, path)
    for where in (
        [("k", "<", 100)],
        [("k", ">=", 900)],
        [("k", "=", 500)],
        [("k", ">", 200), ("k", "<=", 300)],
        [("name", ">=", "u0990")],  # string stats prune too
        [("k", "<", -5)],  # nothing matches: empty result, schema intact
    ):
        pruned_files = S.prune_files(m, where)
        assert len(pruned_files) < len(m["files"]), where
        got = S.scan_snapshot(spark, path, where)
        want = full
        for col, op, v in where:
            c = F.col(col)
            want = want.filter(
                {"=": c == v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
            )
        assert _canon(got) == _canon(want), where
        assert got.columns == full.columns


def test_files_without_stats_always_survive(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite_versioned(spark, _ranged_df(spark), path)  # no stats_cols
    m = S.read_manifest(path)
    assert m["stats"] == {}
    # pruning is a no-op, results still exact
    got = S.scan_snapshot(spark, path, [("k", "<", 10)])
    assert got.count() == 10
    assert S.prune_files(m, [("k", "<", 10)]) == m["files"]


def test_merge_carries_stats_incrementally(spark, tmp_path):
    """apply_changes with pinned stats_cols: every manifest version has
    stats for every file; untouched buckets keep their recorded entries
    (same values as the prior manifest — no footer re-read needed)."""
    path = str(tmp_path / "state")
    chg = spark.createDataFrame(
        [(i, float(i), 100 + i % 5, 0, False) for i in range(200)],
        "account_id long, balance double, last_modified_ledger long, ledger_entry_change long, deleted boolean",
    )
    v1, _ = apply_changes(
        spark, chg, path, ("account_id",), n_buckets=8, stats_cols=("account_id",)
    )
    m1 = S.read_manifest(path, v1)
    assert set(m1["stats"]) == set(m1["files"]) and m1["files"]
    # second batch touches ONE key -> one bucket rewritten
    chg2 = spark.createDataFrame(
        [(7, 999.0, 200, 0, False)],
        "account_id long, balance double, last_modified_ledger long, ledger_entry_change long, deleted boolean",
    )
    v2, touched = apply_changes(spark, chg2, path, ("account_id",))
    assert len(touched) == 1
    m2 = S.read_manifest(path, v2)
    assert set(m2["stats"]) == set(m2["files"])
    carried = set(m1["files"]) & set(m2["files"])
    assert carried  # untouched buckets' files survive with stats
    for f in carried:
        assert m2["stats"][f] == m1["stats"][f]
    # pruned scan over the merged state matches the filtered read
    got = S.scan_snapshot(spark, path, [("account_id", "=", 7)])
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["balance"] == 999.0
    assert len(S.prune_files(m2, [("account_id", "=", 7)])) < len(m2["files"])


def test_clone_and_vacuum_preserve_stats(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    S.overwrite_versioned(spark, _ranged_df(spark, 300, 4), src, stats_cols=("k",))
    S.clone(src, dst)
    assert S.read_manifest(dst)["stats"] == S.read_manifest(src)["stats"]
    # second version then vacuum: retained manifest keeps its stats
    S.overwrite_versioned(spark, _ranged_df(spark, 300, 4), src, stats_cols=("k",))
    S.vacuum(src, keep_versions=1)
    m = S.read_manifest(src)
    assert set(m["stats"]) == set(m["files"]) and m["files"]
    got = S.scan_snapshot(spark, src, [("k", "<", 50)])
    assert got.count() == 50


def test_prune_rejects_unknown_op(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite_versioned(spark, _ranged_df(spark, 50, 2), path, stats_cols=("k",))
    import pytest

    with pytest.raises(ValueError):
        S.prune_files(S.read_manifest(path), [("k", "!=", 3)])
