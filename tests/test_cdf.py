"""Change Data Feed over versioned merge tables (operators/cdf.py):
net row-level deltas between two manifests, read from churned files
only. Delta CDF's reader contract (_change_type in insert / delete /
update_preimage / update_postimage)."""

from __future__ import annotations

import pytest

from stellar_etl_airflow_spark.operators.cdf import (
    CHANGE_TYPE_COL,
    COMMIT_VERSION_COL,
    read_changes,
)
from stellar_etl_airflow_spark.operators.merge import apply_changes
from stellar_etl_airflow_spark.sinks import snapshots as S

SCHEMA = (
    "account_id long, balance double, last_modified_ledger long, "
    "ledger_entry_change long, deleted boolean"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _by_type(df):
    out = {}
    for r in df.collect():
        out.setdefault(r[CHANGE_TYPE_COL], []).append(
            (r["account_id"], r["balance"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_cdf_insert_update_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_changes(
        spark,
        _batch(spark, [(i, float(i * 10), 1, 0, False) for i in range(1, 9)]),
        path, keys=("account_id",), n_buckets=4,
    )
    v1 = S.latest_version(path)
    apply_changes(
        spark,
        _batch(
            spark,
            [
                (2, 999.0, 2, 0, False),   # update
                (9, 90.0, 2, 0, False),    # insert
                (5, None, 2, 0, True),     # delete
            ],
        ),
        path, keys=("account_id",),
    )
    v2 = S.latest_version(path)

    got = _by_type(read_changes(spark, path, v1, v2))
    assert got["insert"] == [(9, 90.0)]
    assert got["delete"] == [(5, 50.0)]
    assert got["update_preimage"] == [(2, 20.0)]
    assert got["update_postimage"] == [(2, 999.0)]
    # bucket rewrites carry untouched keys in the same bucket — they
    # must NOT surface as changes
    assert set(got) == {"insert", "delete", "update_preimage", "update_postimage"}
    df = read_changes(spark, path, v1, v2)
    assert df.select(COMMIT_VERSION_COL).distinct().collect()[0][0] == v2


def test_cdf_net_across_range_and_empty_range(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_changes(
        spark, _batch(spark, [(1, 1.0, 1, 0, False)]), path,
        keys=("account_id",), n_buckets=2,
    )
    v1 = S.latest_version(path)
    # insert then delete the same key inside the range: NET change is
    # nothing for it; key 1's two updates net to one pre/post pair
    apply_changes(spark, _batch(spark, [(7, 7.0, 2, 0, False), (1, 2.0, 2, 0, False)]), path, keys=("account_id",))
    apply_changes(spark, _batch(spark, [(7, None, 3, 0, True), (1, 3.0, 3, 0, False)]), path, keys=("account_id",))
    v3 = S.latest_version(path)

    got = _by_type(read_changes(spark, path, v1, v3))
    assert got == {
        "update_preimage": [(1, 1.0)],
        "update_postimage": [(1, 3.0)],
    }

    # same-version range: zero churn, empty frame with the CDF columns
    empty = read_changes(spark, path, v3, v3)
    assert empty.count() == 0
    assert CHANGE_TYPE_COL in empty.columns and COMMIT_VERSION_COL in empty.columns


def test_cdf_reads_only_churned_files(spark, tmp_path):
    """Cost contract: the feed's scan lists only files in the manifests'
    symmetric difference — untouched buckets' files never appear."""
    path = str(tmp_path / "t")
    apply_changes(
        spark,
        _batch(spark, [(i, float(i), 1, 0, False) for i in range(1, 33)]),
        path, keys=("account_id",), n_buckets=8,
    )
    v1 = S.latest_version(path)
    apply_changes(spark, _batch(spark, [(1, -1.0, 2, 0, False)]), path, keys=("account_id",))
    v2 = S.latest_version(path)

    m1, m2 = S.read_manifest(path, v1), S.read_manifest(path, v2)
    churn = set(m1["files"]) ^ set(m2["files"])
    untouched = set(m1["files"]) & set(m2["files"])
    assert untouched, "need untouched buckets for the contract to mean anything"

    df = read_changes(spark, path, v1, v2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    scanned = set(re.findall(r"file:([^\],\s]+\.parquet)", plan))
    # the plan string truncates long file lists; check what it shows
    for f in scanned:
        assert f not in {u.lstrip("file:") for u in untouched}
    got = _by_type(df)
    assert got["update_postimage"] == [(1, -1.0)]


def test_cdf_schema_evolution_across_range(spark, tmp_path):
    path = str(tmp_path / "t")
    apply_changes(
        spark, _batch(spark, [(1, 1.0, 1, 0, False), (2, 2.0, 1, 0, False)]),
        path, keys=("account_id",), n_buckets=2,
    )
    v1 = S.latest_version(path)
    evolved = spark.createDataFrame(
        [(2, 20.0, 2, 0, False, "gold")], SCHEMA + ", tier string"
    )
    from stellar_etl_airflow_spark.operators.merge import merge_upsert_versioned

    merge_upsert_versioned(
        spark, evolved, path, keys=("account_id",), n_buckets=2,
        allow_schema_evolution=True,
    )
    v2 = S.latest_version(path)
    rows = {
        (r[CHANGE_TYPE_COL], r["account_id"]): r
        for r in read_changes(spark, path, v1, v2).collect()
    }
    assert rows[("update_postimage", 2)]["tier"] == "gold"
    assert rows[("update_preimage", 2)]["tier"] is None


def test_cdf_requires_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select(F_id())
    S.overwrite_versioned(spark, df, path)
    with pytest.raises(ValueError, match="no merge keys"):
        read_changes(spark, path, 1)


def F_id():
    from pyspark.sql import functions as F

    return F.col("id")
