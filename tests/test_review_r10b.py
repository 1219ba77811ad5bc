"""Round-10 part 2: the transactional-append primitive and s14's
exactly-once rewrite.

ADVICE r9 flagged s14's foreachBatch handler for plain non-transactional
parquet appends: foreachBatch is at-least-once, so a retried microbatch
would duplicate accepted doc_ids and index rows while the docstring
presented the path as the production 100 TB shape. VERDICT r9 ask #6
added that the band index grows monotonically with no maintenance
story. Both land here via ``append_versioned`` (Delta append +
txnAppId/txnVersion): staged-once files, manifest CAS with commutative
rebase, an applied-txn ledger that turns redelivery into a no-op, and
``compact_small_files`` as the index's bin-packing cadence — the ledger
rides through compaction so maintenance never reopens the replay hole.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from stellar_etl_airflow_spark.sinks import snapshots as S


def _rows(spark, tbl):
    return sorted(
        tuple(r) for r in S.read_snapshot(spark, tbl).collect()
    )


def _mk(spark, pairs):
    # one part file per append: keeps file-count/stats assertions exact
    return spark.createDataFrame(pairs, "k long, v long").repartition(1)


def test_append_bootstrap_then_append(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v1 = S.append_versioned(spark, _mk(spark, [(1, 10)]), tbl)
    v2 = S.append_versioned(spark, _mk(spark, [(2, 20)]), tbl)
    assert (v1, v2) == (1, 2)
    assert _rows(spark, tbl) == [(1, 10), (2, 20)]
    # time travel: v1 sees only the first append
    assert [tuple(r) for r in S.read_snapshot(spark, tbl, version=1).collect()] == [(1, 10)]


def test_append_txn_replay_is_noop(spark, tmp_path):
    """The exactly-once contract: redelivering a txn_id returns the
    recorded version and writes NOTHING — no new rows, no new version."""
    tbl = str(tmp_path / "t")
    S.append_versioned(spark, _mk(spark, [(1, 10)]), tbl, txn_id="b0")
    v = S.append_versioned(spark, _mk(spark, [(2, 20)]), tbl, txn_id="b1")
    replay = S.append_versioned(
        spark, _mk(spark, [(2, 20), (99, 99)]), tbl, txn_id="b1"
    )
    assert replay == v
    assert S.latest_version(tbl) == v
    assert _rows(spark, tbl) == [(1, 10), (2, 20)]


def test_append_same_txn_race_single_landing(spark, tmp_path, monkeypatch):
    """Two instances of the SAME txn race past the cheap pre-stage
    replay check (deterministic interleaving: the peer publishes while
    we stage). The loser must detect the recorded txn at publish time,
    delete its now-unreferenced staged files, and return the peer's
    version — zero duplicate rows, zero orphans."""
    tbl = str(tmp_path / "t")
    S.append_versioned(spark, _mk(spark, [(0, 0)]), tbl)  # v1, so no bootstrap path
    real_adopt = S.adopt_staged
    fired = {"n": 0}

    def adopt_then_peer_lands(stage, path):
        out = real_adopt(stage, path)
        if fired["n"] == 0:
            fired["n"] += 1
            # the peer instance of txn "bX" publishes first
            monkeypatch.undo()
            S.append_versioned(spark, _mk(spark, [(5, 50)]), tbl, txn_id="bX")
        return out

    monkeypatch.setattr(S, "adopt_staged", adopt_then_peer_lands)
    v = S.append_versioned(spark, _mk(spark, [(5, 50)]), tbl, txn_id="bX")
    assert v == S.latest_version(tbl)
    assert _rows(spark, tbl) == [(0, 0), (5, 50)]
    # the loser's staged files are gone: every .parquet under the table
    # root is referenced by the live manifest
    m = S.read_manifest(tbl, resolve=False)
    import os

    on_disk = {
        os.path.join(tbl, f) for f in os.listdir(tbl) if f.endswith(".parquet")
    }
    assert on_disk == set(m["files"])


def test_append_concurrent_distinct_txns_all_land(spark, tmp_path):
    """Eight concurrent appenders with distinct txns: appends commute,
    so every writer rebases through lost CAS and ALL rows land exactly
    once."""
    tbl = str(tmp_path / "t")
    errs = []

    def w(i):
        try:
            S.append_versioned(
                spark, _mk(spark, [(i, i * 10)]), tbl, txn_id=f"w{i}"
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append((i, e))

    ts = [threading.Thread(target=w, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert _rows(spark, tbl) == [(i, i * 10) for i in range(8)]
    m = S.read_manifest(tbl, resolve=False)
    assert set(m["txns"]) == {f"w{i}" for i in range(8)}


def test_append_guards(spark, tmp_path):
    """Schema drift, bucketed layouts, and column-mapped tables are
    refused — the merge path owns those shapes."""
    from stellar_etl_airflow_spark.operators import merge as M

    tbl = str(tmp_path / "t")
    S.append_versioned(spark, _mk(spark, [(1, 10)]), tbl)
    with pytest.raises(ValueError, match="schema mismatch"):
        S.append_versioned(
            spark, spark.createDataFrame([(1, 1)], "k long, other long"), tbl
        )
    S.rename_column(tbl, "v", "val")
    with pytest.raises(NotImplementedError, match="column mapping"):
        S.append_versioned(
            spark, spark.createDataFrame([(1, 1)], "k long, val long"), tbl
        )
    btbl = str(tmp_path / "b")
    M.merge_additive_versioned(
        spark, _mk(spark, [(1, 10)]), btbl, keys=("k",), sum_cols=("v",), n_buckets=2
    )
    with pytest.raises(NotImplementedError, match="bucketed"):
        S.append_versioned(spark, _mk(spark, [(2, 20)]), btbl)


def test_append_compaction_carries_ledger_and_content(spark, tmp_path):
    """The s14 band-index maintenance story end-to-end: N small appends,
    then compact_small_files bin-packs them; content is preserved, file
    count drops, and a post-compaction replay of an OLD txn is still a
    no-op (the ledger rode through)."""
    tbl = str(tmp_path / "t")
    for i in range(6):
        S.append_versioned(spark, _mk(spark, [(i, i)]), tbl, txn_id=f"b{i}")
    before = _rows(spark, tbl)
    n_before = len(S.read_manifest(tbl, resolve=False)["files"])
    v, rewritten = S.compact_small_files(spark, tbl)
    assert rewritten == n_before
    assert len(S.read_manifest(tbl, resolve=False)["files"]) == 1
    assert _rows(spark, tbl) == before
    replay = S.append_versioned(spark, _mk(spark, [(3, 999)]), tbl, txn_id="b3")
    assert replay < v  # the ORIGINAL recorded version, not a new write
    assert S.latest_version(tbl) == v
    assert _rows(spark, tbl) == before


def test_append_keeps_stats_and_bloom_pins(spark, tmp_path):
    """Stats/bloom pins default to the table's existing pins; prior
    files keep recorded stats, only new files pay footers."""
    tbl = str(tmp_path / "t")
    S.append_versioned(
        spark, _mk(spark, [(1, 10)]), tbl, stats_cols=("k",), bloom_cols=("k",)
    )
    S.append_versioned(spark, _mk(spark, [(2, 20)]), tbl)  # pins inherited
    m = S.read_manifest(tbl)
    assert m["stats_cols"] == ["k"] and m["bloom_cols"] == ["k"]
    stats, blooms = S.resolved_stats_blooms(m)
    files = [f for f in m["files"]]
    assert all(f in stats and f in blooms for f in files)
    # manifest pruning works across appended files
    survivors = S.prune_files(m, [("k", "=", 2)])
    assert len(survivors) == 1


def test_s14_microbatch_replay_no_duplicates(spark, tmp_path):
    """The s14 shape under foreachBatch redelivery: probe + two appends
    run TWICE with the same epoch-derived txn ids; accepted doc_ids and
    index rows must not duplicate."""
    acc = str(tmp_path / "acc")
    idx = str(tmp_path / "idx")
    seed = spark.createDataFrame(
        [(1, 0, "d1", [1, 2]), (1, 1, "d2", [3, 4])],
        "doc long, band int, digest string, sig array<int>",
    )
    S.append_versioned(spark, seed, idx, txn_id="seed")
    batch_rows = spark.createDataFrame([(7,)], "doc_id long")
    new_idx_rows = spark.createDataFrame(
        [(7, 0, "dX", [9, 9])], "doc long, band int, digest string, sig array<int>"
    )
    for _ in range(2):  # the retry
        S.append_versioned(spark, batch_rows, acc, txn_id="s14-acc-0")
        S.append_versioned(spark, new_idx_rows, idx, txn_id="s14-idx-0")
    assert S.read_snapshot(spark, acc).count() == 1
    assert S.read_snapshot(spark, idx).count() == 3


# ---------------------------------------------------------------------------
# Publish-time conflict RESOLUTION (r10): a merge that loses the CAS
# rebases WITHOUT recompute when the intervening commits preserved its
# touched buckets' content (compact / disjoint-bucket merges), and only
# escalates to the outer full-recompute wrapper otherwise. Found by the
# concurrency storm probe: a 0.2 s OPTIMIZE loop starved 6/6 mergers
# (each burned 30 full recomputes) under blind CAS retry.
# ---------------------------------------------------------------------------

from stellar_etl_airflow_spark.operators import merge as M  # noqa: E402


def _stats():
    return dict(M.MERGE_STATS)


def _add(spark, tbl, keys_vals, txn, n_buckets=4):
    df = spark.createDataFrame(keys_vals, "k long, n long").repartition(1)
    return M.merge_additive_versioned(
        spark, df, tbl, keys=("k",), sum_cols=("n",), n_buckets=n_buckets, txn_id=txn
    )


def _counts(spark, tbl):
    return {r["k"]: r["n"] for r in S.read_snapshot(spark, tbl).collect()}


def _interleave_peer(monkeypatch, peer):
    """Fire ``peer()`` right after the NEXT merge stages its files —
    the deterministic lost-CAS interleaving."""
    real_adopt = S.adopt_staged

    def hook(stage, path):
        out = real_adopt(stage, path)
        monkeypatch.undo()
        peer()
        return out

    monkeypatch.setattr(S, "adopt_staged", hook)


def test_merge_rebases_over_concurrent_compact(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    _add(spark, tbl, [(k, 1) for k in range(8)], "seed")
    base = _stats()
    _interleave_peer(monkeypatch, lambda: S.compact_snapshot(spark, tbl))
    _add(spark, tbl, [(k, 1) for k in range(4)], "b1")
    assert _stats() == {**base, "rebases": base["rebases"] + 1}
    assert _counts(spark, tbl) == {k: (2 if k < 4 else 1) for k in range(8)}
    m = S.read_manifest(tbl, resolve=False)
    assert m["op"] == "merge" and m["op_info"]["flat"] is False
    assert set(m["op_info"]["buckets"])


def test_merge_rebases_over_disjoint_merge(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    # split keys by their actual bucket so the two merges are provably
    # bucket-disjoint under n_buckets=4
    from stellar_etl_airflow_spark.operators.merge import key_bucket

    probe = spark.range(64).select(
        F.col("id").alias("k"), key_bucket(("k",), 4).alias("b")
    )
    by_bucket = {}
    for r in probe.collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    mine, theirs = by_bucket[0][:3], by_bucket[1][:3]
    _add(spark, tbl, [(k, 1) for k in mine + theirs], "seed")
    base = _stats()
    _interleave_peer(
        monkeypatch, lambda: _add(spark, tbl, [(k, 10) for k in theirs], "peer")
    )
    _add(spark, tbl, [(k, 100) for k in mine], "b1")
    assert _stats() == {**base, "rebases": base["rebases"] + 1}
    want = {k: 101 for k in mine} | {k: 11 for k in theirs}
    assert _counts(spark, tbl) == want


def test_merge_recomputes_over_overlapping_merge(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "t")
    _add(spark, tbl, [(k, 1) for k in range(4)], "seed")
    base = _stats()
    _interleave_peer(
        monkeypatch, lambda: _add(spark, tbl, [(k, 10) for k in range(4)], "peer")
    )
    _add(spark, tbl, [(k, 100) for k in range(4)], "b1")
    st = _stats()
    assert st["recomputes"] == base["recomputes"] + 1
    assert _counts(spark, tbl) == {k: 111 for k in range(4)}
    # the recompute dropped the stale attempt's files: everything under
    # the bucket dirs is referenced by SOME retained manifest
    import os

    referenced = set()
    for v in S._versions_on_disk(tbl):
        referenced |= set(S.read_manifest(tbl, v, resolve=False)["files"])
    on_disk = set()
    for root, _dirs, files in os.walk(tbl):
        on_disk |= {os.path.join(root, f) for f in files if f.endswith(".parquet")}
    assert on_disk <= referenced


def test_merge_refuses_rebase_after_flat_absorption(spark, tmp_path, monkeypatch):
    """A merge that absorbed flat pre-bucketing files rewrote rows for
    EVERY bucket — rebase would duplicate them; the op_info records it
    and the conflict path recomputes."""
    tbl = str(tmp_path / "t")
    spark.createDataFrame([(k, 1) for k in range(8)], "k long, n long").coalesce(
        1
    ).write.parquet(tbl)
    S.snapshot(tbl)  # flat bootstrap, op="bootstrap"
    assert S.read_manifest(tbl, resolve=False)["op"] == "bootstrap"
    base = _stats()
    _interleave_peer(monkeypatch, lambda: S.compact_snapshot(spark, tbl))
    _add(spark, tbl, [(0, 1)], "b1")
    st = _stats()
    assert st["recomputes"] == base["recomputes"] + 1
    assert _counts(spark, tbl) == {k: (2 if k == 0 else 1) for k in range(8)}


def test_mini_storm_disjoint_mergers_with_compactor(spark, tmp_path):
    """In-suite slice of tools/concurrency_storm.py: 3 bucket-disjoint
    additive mergers race a compaction loop; counters stay exact and
    merger-vs-compactor losses resolve as rebases, never starvation."""
    import time

    from stellar_etl_airflow_spark.operators.merge import key_bucket

    tbl = str(tmp_path / "t")
    _add(spark, tbl, [(k, 0) for k in range(32)], "seed", n_buckets=4)
    probe = spark.range(32).select(F.col("id").alias("k"), key_bucket(("k",), 4).alias("b"))
    owner = {}
    for r in probe.collect():
        owner.setdefault(r["b"], []).append(r["k"])
    stop = {"f": False}
    errs = []

    def merger(w):
        try:
            for rnd in range(2):
                _add(spark, tbl, [(k, 1) for k in owner[w]], f"w{w}-r{rnd}")
        except Exception as e:  # pragma: no cover
            errs.append(f"w{w}: {e}")

    def compactor():
        while not stop["f"]:
            try:
                S.compact_snapshot(spark, tbl)
            except S.ConcurrentWriteError:
                pass
            time.sleep(0.1)

    ct = threading.Thread(target=compactor)
    ts = [threading.Thread(target=merger, args=(w,)) for w in range(3)]
    ct.start()
    [t.start() for t in ts]
    [t.join() for t in ts]
    stop["f"] = True
    ct.join()
    assert not errs
    want = {k: 0 for k in range(32)}
    for w in range(3):
        for k in owner[w]:
            want[k] = 2
    assert _counts(spark, tbl) == want


def test_concurrent_vacuum_double_delete_is_benign(spark, tmp_path, monkeypatch):
    """Two vacuums racing on the same expired files: the loser's
    os.remove hits FileNotFoundError and must skip, not crash — the
    same window the r10 merge cleanup (stale-attempt file deletion)
    opens against a running vacuum."""
    import os

    tbl = str(tmp_path / "t")
    for i in range(3):
        S.append_versioned(spark, _mk(spark, [(i, i)]), tbl, txn_id=f"b{i}")
    S.compact_small_files(spark, tbl)  # v4: first three versions expire
    real_remove = os.remove
    raced = {"n": 0}

    def racing_remove(p):
        if p.endswith(".parquet") and raced["n"] == 0:
            raced["n"] += 1
            real_remove(p)  # the peer vacuum deletes it first ...
        return real_remove(p)  # ... and ours must tolerate the miss

    monkeypatch.setattr(os, "remove", racing_remove)
    gone = S.vacuum(tbl, keep_versions=1)
    monkeypatch.undo()
    assert raced["n"] == 1
    # the raced file is NOT claimed by this vacuum's report, the rest are
    assert S.fsck_repair(tbl, dry_run=True) == []
    assert sorted(tuple(r) for r in S.read_snapshot(spark, tbl).collect()) == [
        (i, i) for i in range(3)
    ]
    assert all(not os.path.exists(f) for f in gone)


def test_append_refuses_mapping_landed_mid_retry(spark, tmp_path, monkeypatch):
    """A rename racing the append (lands after the pre-stage guard):
    the publish loop must re-check the mapping, drop its staged files,
    and refuse — not fork the physical schema."""
    import os

    tbl = str(tmp_path / "t")
    S.append_versioned(spark, _mk(spark, [(1, 10)]), tbl)
    real_adopt = S.adopt_staged

    def adopt_then_rename(stage, path):
        out = real_adopt(stage, path)
        monkeypatch.undo()
        S.rename_column(tbl, "v", "val")
        return out

    monkeypatch.setattr(S, "adopt_staged", adopt_then_rename)
    with pytest.raises(NotImplementedError, match="gained a column mapping"):
        S.append_versioned(spark, _mk(spark, [(2, 20)]), tbl, txn_id="b1")
    # staged files dropped; the table reads cleanly under the mapping
    m = S.read_manifest(tbl, resolve=False)
    on_disk = {os.path.join(tbl, f) for f in os.listdir(tbl) if f.endswith(".parquet")}
    assert on_disk == set(m["files"])
    assert [r["val"] for r in S.read_snapshot(spark, tbl).collect()] == [10]


def test_compact_small_files_rebases_over_append(spark, tmp_path, monkeypatch):
    """Maintenance never blocks the stream: a bin-packing pass that
    loses its CAS to a concurrent APPEND re-lists (appended files are
    disjoint from the rewritten small set) instead of redoing the
    rewrite; content = everything, ledger keeps the append's txn."""
    tbl = str(tmp_path / "t")
    for i in range(4):
        S.append_versioned(spark, _mk(spark, [(i, i)]), tbl, txn_id=f"b{i}")
    real_adopt = S.adopt_staged

    def adopt_then_append(stage, path):
        out = real_adopt(stage, path)
        monkeypatch.undo()
        S.append_versioned(spark, _mk(spark, [(99, 99)]), tbl, txn_id="race")
        return out

    monkeypatch.setattr(S, "adopt_staged", adopt_then_append)
    v, rewritten = S.compact_small_files(spark, tbl)
    assert rewritten >= 4 and v == S.latest_version(tbl)
    assert _rows(spark, tbl) == [(i, i) for i in range(4)] + [(99, 99)]
    m = S.read_manifest(tbl, resolve=False)
    assert "race" in (m.get("txns") or {})
    # a replay of the racing append is still a no-op post-compaction
    S.append_versioned(spark, _mk(spark, [(99, 99)]), tbl, txn_id="race")
    assert S.latest_version(tbl) == v


def test_compact_small_files_still_raises_on_non_append_race(spark, tmp_path, monkeypatch):
    """A content-changing intervening commit (overwrite) must surface
    as ConcurrentWriteError — the bin-packed output is stale."""
    tbl = str(tmp_path / "t")
    for i in range(3):
        S.append_versioned(spark, _mk(spark, [(i, i)]), tbl)
    real_adopt = S.adopt_staged

    def adopt_then_overwrite(stage, path):
        out = real_adopt(stage, path)
        monkeypatch.undo()
        S.overwrite_versioned(spark, _mk(spark, [(7, 7)]), tbl)
        return out

    monkeypatch.setattr(S, "adopt_staged", adopt_then_overwrite)
    with pytest.raises(S.ConcurrentWriteError):
        S.compact_small_files(spark, tbl)
    assert _rows(spark, tbl) == [(7, 7)]
