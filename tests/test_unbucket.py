"""The bucketed-table escape hatch (r8, VERDICT r7 ask #5):
snapshots.unbucket_snapshot + the operators/jobs.py wrappers take a
DEFAULT apply_changes state table through RENAME COLUMN and a
deletion-vector DELETE without manual surgery, carrying the txn ledger
and history; a later apply_changes re-pins a fresh bucket layout."""

from __future__ import annotations

import pytest

from stellar_etl_airflow_spark.operators import jobs as J
from stellar_etl_airflow_spark.operators.merge import apply_changes, load_table_props
from stellar_etl_airflow_spark.sinks import snapshots as S


def _batch(spark, rows):
    return spark.createDataFrame(
        [(k, v, False, lml, 1) for k, v, lml in rows],
        "account_id long, balance long, deleted boolean, "
        "last_modified_ledger long, ledger_entry_change int",
    )


def _state(spark, path, col="balance"):
    return {
        r["account_id"]: r[col]
        for r in S.read_snapshot(spark, path).collect()
    }


@pytest.fixture()
def state_table(spark, tmp_path):
    path = str(tmp_path / "accounts")
    apply_changes(
        spark, _batch(spark, [(1, 10, 1), (2, 20, 1), (3, 30, 1)]),
        path, keys=("account_id",), n_buckets=4, txn_id="b1",
    )
    apply_changes(
        spark, _batch(spark, [(2, 25, 2), (4, 40, 2)]),
        path, keys=("account_id",), n_buckets=4, txn_id="b2",
    )
    return path


def test_unbucket_preserves_content_ledger_and_history(spark, state_table):
    v_before = S.latest_version(state_table)
    before = _state(spark, state_table)
    v = S.unbucket_snapshot(spark, state_table)
    assert v == v_before + 1
    assert _state(spark, state_table) == before
    # bucket column gone, layout pins dropped, ledger carried
    assert "_p" not in S.read_snapshot(spark, state_table).columns
    assert load_table_props(state_table) is None
    m = S.read_manifest(state_table)
    assert set(m["txns"]) == {"b1", "b2"}
    assert not any("_p=" in f for f in m["files"])
    # prior versions still time-travel under the old bucketed layout
    assert _state(spark, state_table, col="balance") == before
    assert len(S.read_snapshot(spark, state_table, v_before).collect()) == 4


def test_rename_state_column_on_bucketed_table(spark, state_table):
    # direct rename refuses the bucketed layout...
    with pytest.raises(NotImplementedError):
        S.rename_column(state_table, "balance", "amount")
    # ...the jobs wrapper unbuckets then renames without a data rewrite
    v = J.rename_state_column(spark, state_table, "balance", "amount")
    df = S.read_snapshot(spark, state_table)
    assert "amount" in df.columns and "balance" not in df.columns
    assert _state(spark, state_table, col="amount") == {1: 10, 2: 25, 3: 30, 4: 40}
    # the rename itself was metadata-only: same files as the unbucket
    assert S.read_manifest(state_table, v)["files"] == S.read_manifest(
        state_table, v - 1
    )["files"]


def test_dv_delete_on_bucketed_table(spark, state_table):
    with pytest.raises(NotImplementedError):
        S.delete_where_dv(spark, state_table, [("account_id", "=", 2)])
    version, deleted = J.delete_state_rows_dv(
        spark, state_table, [("account_id", "=", 2)]
    )
    assert deleted == 1
    assert _state(spark, state_table) == {1: 10, 3: 30, 4: 40}
    # merge-on-read: the delete published no new data files
    m = S.read_manifest(state_table)
    assert m["files"] == S.read_manifest(state_table, version - 1)["files"]
    assert m.get("dv")


def test_apply_changes_rebuckets_after_unbucket(spark, state_table):
    S.unbucket_snapshot(spark, state_table)
    apply_changes(
        spark, _batch(spark, [(1, 11, 3), (5, 50, 3)]),
        state_table, keys=("account_id",), n_buckets=8, txn_id="b3",
    )
    assert _state(spark, state_table) == {1: 11, 2: 25, 3: 30, 4: 40, 5: 50}
    props = load_table_props(state_table)
    assert props and props["n_buckets"] == 8  # fresh layout re-pinned
    m = S.read_manifest(state_table)
    assert set(m["txns"]) == {"b1", "b2", "b3"}  # exactly-once survived
    assert all("_p=" in f for f in m["files"])


def test_unbucket_publish_is_cas_guarded(spark, state_table):
    """Review r8: unbucket derives content from version v and must fail
    (ConcurrentWriteError) if another writer published meanwhile, never
    silently clobber — same CAS rule as the merge paths. Pinned via the
    overwrite_versioned expected_version plumbing unbucket uses."""
    m = S.read_manifest(state_table, resolve=False)
    df = S.read_snapshot(spark, state_table).drop("_p")
    with pytest.raises(S.ConcurrentWriteError):
        S.overwrite_versioned(
            spark, df, state_table, expected_version=int(m["version"]) - 1
        )
    # the failed attempt consumed no version slot; the happy path
    # publishes the next version as usual
    assert S.unbucket_snapshot(spark, state_table) == int(m["version"]) + 1
