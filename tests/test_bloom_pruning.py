"""Manifest-resident per-file bloom filters (r7): equality pruning on
hash-like keys where [min, max] stats are useless — every file's range
spans the whole key space, so only a membership structure can skip
files. Iceberg stores these as puffin blobs; here they live in the
manifest (m=8192 bits -> ~1 KiB/file/col, documented tradeoff)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.merge import apply_changes
from stellar_etl_airflow_spark.sinks import snapshots as S


def _hashed_df(spark, n=2000, parts=6):
    # md5-keyed rows: every file's [min, max] covers ~the full hex space
    return (
        spark.range(n)
        .select(
            F.md5(F.col("id").cast("string")).alias("h"),
            F.col("id").alias("v"),
        )
        .repartition(parts, "h")
    )


def _key(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


def test_bloom_prunes_equality_on_hashlike_key(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite_versioned(
        spark, _hashed_df(spark), path, stats_cols=("h",), bloom_cols=("h",)
    )
    m = S.read_manifest(path)
    assert m["bloom_cols"] == ["h"]
    assert set(m["blooms"]) == set(m["files"])

    probe = _key(123)
    # min/max alone cannot prune hex-random keys; blooms must
    stats_only = {**m, "blooms": {}}
    assert len(S.prune_files(stats_only, [("h", "=", probe)])) == len(m["files"])
    kept = S.prune_files(m, [("h", "=", probe)])
    assert len(kept) < len(m["files"])

    # the pruned scan still returns the row (no false negatives)
    got = S.scan_snapshot(spark, path, where=[("h", "=", probe)]).collect()
    assert [r["v"] for r in got] == [123]

    # absent keys: usually zero files survive, never a wrong row
    miss = _key(999_999)
    assert S.scan_snapshot(spark, path, where=[("h", "=", miss)]).count() == 0


def test_bloom_no_false_negatives_exhaustive(spark, tmp_path):
    path = str(tmp_path / "t")
    n = 500
    S.overwrite_versioned(spark, _hashed_df(spark, n=n), path, bloom_cols=("h",))
    m = S.read_manifest(path)
    full = (
        spark.read.parquet(*m["files"])
        .select("h", F.input_file_name().alias("f"))
        .collect()
    )
    from urllib.parse import unquote, urlparse
    import os

    owner = {r["h"]: os.path.abspath(unquote(urlparse(r["f"]).path)) for r in full}
    for i in range(n):
        k = _key(i)
        assert owner[k] in S.prune_files(m, [("h", "=", k)])


def test_bloom_incremental_through_merge_and_clone(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(_key(i), i, 1, 0, False) for i in range(200)],
        "h string, v long, last_modified_ledger long, ledger_entry_change long, deleted boolean",
    )
    apply_changes(
        spark, df, path, keys=("h",), n_buckets=8, bloom_cols=("h",)
    )
    m1 = S.read_manifest(path)
    assert set(m1["blooms"]) == set(m1["files"])

    # merge a batch touching a few keys: untouched buckets keep their
    # recorded blooms (no recompute), new files gain filters
    upd = spark.createDataFrame(
        [(_key(7), 700, 2, 0, False), (_key(201), 201, 2, 0, False)],
        df.schema,
    )
    apply_changes(spark, upd, path, keys=("h",), n_buckets=8)
    m2 = S.read_manifest(path)
    assert set(m2["blooms"]) == set(m2["files"])
    carried = set(m1["files"]) & set(m2["files"])
    assert carried and all(m2["blooms"][f] == m1["blooms"][f] for f in carried)

    # updated + brand-new keys are findable through the pruned scan
    for k, v in ((_key(7), 700), (_key(201), 201), (_key(42), 42)):
        got = S.scan_snapshot(spark, path, where=[("h", "=", k)]).collect()
        assert [r["v"] for r in got] == [v]

    # zero-copy clone carries the filters verbatim
    dst = str(tmp_path / "c")
    S.clone(path, dst)
    mc = S.read_manifest(dst)
    assert mc["blooms"] == m2["blooms"] and mc["bloom_cols"] == ["h"]


def test_bloom_integral_and_bool_canonicalization(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("even")
    ).repartition(4, "k")
    S.overwrite_versioned(spark, df, path, bloom_cols=("k", "even"))
    m = S.read_manifest(path)
    # int probe: Spark CAST(bigint AS STRING) == str(int)
    assert S.scan_snapshot(spark, path, where=[("k", "=", 250)]).count() == 1
    assert S.scan_snapshot(spark, path, where=[("k", "=", 5000)]).count() == 0
    # bool probe: canonicalized to "true"/"false"
    assert S.scan_snapshot(spark, path, where=[("even", "=", True)]).count() == 150
    # a range predicate on a bloom-only column is simply not bloom-pruned
    assert len(S.prune_files(m, [("k", ">=", 0)])) == len(m["files"])


def test_in_list_batch_probe_pruning(spark, tmp_path):
    """The real merge probe is a BATCH of keys: op "in" keeps a file iff
    ANY listed value may be present (bloom + [min,max] per value)."""
    path = str(tmp_path / "t")
    S.overwrite_versioned(
        spark, _hashed_df(spark), path, stats_cols=("h",), bloom_cols=("h",)
    )
    m = S.read_manifest(path)
    present = [_key(i) for i in (3, 77, 1500)]
    absent = [_key(i) for i in range(10_000, 10_020)]

    kept = S.prune_files(m, [("h", "in", present)])
    assert kept and len(kept) < len(m["files"])
    got = S.scan_snapshot(spark, path, where=[("h", "in", present)]).collect()
    assert sorted(r["v"] for r in got) == [3, 77, 1500]

    # all-absent batch: blooms usually drop everything, never wrong rows
    assert S.scan_snapshot(spark, path, where=[("h", "in", absent)]).count() == 0

    # "in" works stats-only too (range exclusion per value)
    df = spark.range(1000).select(F.col("id").alias("k")).repartitionByRange(8, "k")
    p2 = str(tmp_path / "t2")
    S.overwrite_versioned(spark, df, p2, stats_cols=("k",))
    m2 = S.read_manifest(p2)
    kept2 = S.prune_files(m2, [("k", "in", [5, 990])])
    assert 0 < len(kept2) <= 2
    assert S.scan_snapshot(spark, p2, where=[("k", "in", [5, 990])]).count() == 2
