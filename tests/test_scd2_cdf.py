"""Incremental SCD-2 from the Change Data Feed (operators/scd2.py::
scd2_apply_cdf): equivalent to the full-state dbt-snapshot path
(scd2_apply) whenever the snapshot's open rows match the CDF range's
base version — but touching only churned keys.

Reference parity: dag_snapshot.py:118-178 re-reads full state daily;
this is the same history table maintained from deltas.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators import scd2 as S2
from stellar_etl_airflow_spark.operators.cdf import read_changes
from stellar_etl_airflow_spark.operators.merge import BUCKET_COL, apply_changes
from stellar_etl_airflow_spark.sinks import snapshots as S

SCHEMA = "account_id long, balance double, seq long, deleted boolean"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, path, version):
    return S.read_snapshot(spark, path, version).drop(BUCKET_COL)


def _norm(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


TS1, TS2, TS3 = datetime(2024, 1, 1), datetime(2024, 1, 2), datetime(2024, 1, 3)


def test_cdf_scd2_matches_full_state_apply(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_changes(
        spark,
        _batch(spark, [(i, float(i * 10), 1, False) for i in range(1, 9)]),
        path, keys=("account_id",), n_buckets=4, order_cols=("seq",),
    )
    v1 = S.latest_version(path)
    apply_changes(
        spark,
        _batch(spark, [
            (2, 999.0, 2, False),   # update
            (9, 90.0, 2, False),    # insert
            (5, None, 2, True),     # delete
            (3, 30.0, 1, False),    # no-op upsert (identical row) -> no change
        ]),
        path, keys=("account_id",), order_cols=("seq",),
    )
    v2 = S.latest_version(path)

    snap1 = S2.scd2_init(_state(spark, path, v1), ("account_id",), TS1)

    full = S2.scd2_apply(snap1, _state(spark, path, v2), ("account_id",), TS2)
    incr = S2.scd2_apply_cdf(
        snap1, read_changes(spark, path, v1, v2), ("account_id",), TS2
    )
    assert _norm(incr) == _norm(full)
    # the no-op upsert key must remain a single open row from TS1
    k3 = incr.filter(F.col("account_id") == 3).collect()
    assert len(k3) == 1 and k3[0]["valid_to"] is None and k3[0]["valid_from"] == TS1


def test_cdf_scd2_reinsert_after_delete_and_noop_feed(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_changes(
        spark, _batch(spark, [(1, 1.0, 1, False), (2, 2.0, 1, False)]),
        path, keys=("account_id",), n_buckets=2, order_cols=("seq",),
    )
    v1 = S.latest_version(path)
    apply_changes(spark, _batch(spark, [(1, None, 2, True)]), path, keys=("account_id",), order_cols=("seq",))
    v2 = S.latest_version(path)
    apply_changes(spark, _batch(spark, [(1, 111.0, 3, False)]), path, keys=("account_id",), order_cols=("seq",))
    v3 = S.latest_version(path)

    snap = S2.scd2_init(_state(spark, path, v1), ("account_id",), TS1)
    snap = S2.scd2_apply_cdf(snap, read_changes(spark, path, v1, v2), ("account_id",), TS2)
    snap = S2.scd2_apply_cdf(snap, read_changes(spark, path, v2, v3), ("account_id",), TS3)

    k1 = sorted(
        ((r["valid_from"], r["valid_to"], r["balance"]) for r in
         snap.filter(F.col("account_id") == 1).collect())
    )
    # closed first life [TS1, TS2), open second life [TS3, NULL)
    assert k1 == [(TS1, TS2, 1.0), (TS3, None, 111.0)]
    # untouched key rides through both steps unchanged
    k2 = snap.filter(F.col("account_id") == 2).collect()
    assert len(k2) == 1 and k2[0]["valid_to"] is None and k2[0]["valid_from"] == TS1

    # an empty CDF range is a no-op on the snapshot
    again = S2.scd2_apply_cdf(snap, read_changes(spark, path, v3, v3), ("account_id",), TS3)
    assert _norm(again) == _norm(snap)

    # current_of reflects final state: key 1 reborn, key 2 original
    cur = {r["account_id"]: r["balance"] for r in S2.current_of(snap).collect()}
    assert cur == {1: 111.0, 2: 2.0}


def test_cdf_scd2_untouched_side_is_broadcast_anti(spark, tmp_path):
    """Plan contract: the big history side passes through a BROADCAST
    anti join — no exchange of the snapshot on the untouched path."""
    path = str(tmp_path / "t")
    apply_changes(
        spark, _batch(spark, [(i, float(i), 1, False) for i in range(1, 30)]),
        path, keys=("account_id",), n_buckets=4, order_cols=("seq",),
    )
    v1 = S.latest_version(path)
    apply_changes(spark, _batch(spark, [(1, -1.0, 2, False)]), path, keys=("account_id",), order_cols=("seq",))
    v2 = S.latest_version(path)

    snap = S2.scd2_init(_state(spark, path, v1), ("account_id",), TS1)
    out = S2.scd2_apply_cdf(snap, read_changes(spark, path, v1, v2), ("account_id",), TS2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), plan
