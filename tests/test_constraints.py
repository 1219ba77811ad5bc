"""CHECK constraints on versioned tables (Delta ADD CONSTRAINT parity):
metadata-only DDL, one-pass validation, enforcement on every library
write surface, survival across overwrite/clone/restore/compaction and
interaction with column mapping."""

from __future__ import annotations

import pytest

from stellar_etl_airflow_spark.sinks import snapshots as S
from stellar_etl_airflow_spark.sinks.snapshots import ConstraintViolation


def _mk(spark, path):
    S.overwrite_versioned(
        spark,
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, None)], "id long, amount double"
        ),
        path,
    )
    return path


def test_add_constraint_validates_and_is_metadata_only(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    files = sorted(S.read_manifest(tbl)["files"])
    v = S.add_constraint(spark, tbl, "amount_pos", "amount > 0")  # NULL passes
    assert v == 2
    assert sorted(S.read_manifest(tbl)["files"]) == files
    # a constraint current data violates is rejected at ADD time
    with pytest.raises(ConstraintViolation, match="amount_big"):
        S.add_constraint(spark, tbl, "amount_big", "amount > 15")
    with pytest.raises(ValueError, match="already exists"):
        S.add_constraint(spark, tbl, "amount_pos", "amount > 0")


def test_overwrite_enforces_and_carries_constraints(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.add_constraint(spark, tbl, "amount_pos", "amount > 0")
    bad = spark.createDataFrame([(9, -1.0)], "id long, amount double")
    with pytest.raises(ConstraintViolation, match="amount_pos"):
        S.overwrite_versioned(spark, bad, tbl)
    ok = spark.createDataFrame([(9, 1.0)], "id long, amount double")
    S.overwrite_versioned(spark, ok, tbl)
    assert S.read_manifest(tbl)["constraints"] == {"amount_pos": "amount > 0"}


def test_update_where_enforces_constraints(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.add_constraint(spark, tbl, "amount_pos", "amount > 0")
    with pytest.raises(ConstraintViolation, match="amount_pos"):
        S.update_where(spark, tbl, [("id", "=", 1)], {"amount": "-5.0"})
    # the failed DML must not have published anything
    assert {r["id"]: r["amount"] for r in S.read_snapshot(spark, tbl).collect()}[1] == 10.0
    S.update_where(spark, tbl, [("id", "=", 1)], {"amount": "15.0"})
    assert {r["id"]: r["amount"] for r in S.read_snapshot(spark, tbl).collect()}[1] == 15.0


def test_constraints_survive_clone_restore_compact_and_drop(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.add_constraint(spark, tbl, "amount_pos", "amount > 0")  # v2
    cl = str(tmp_path / "c")
    S.clone(tbl, cl)
    assert S.read_manifest(cl)["constraints"] == {"amount_pos": "amount > 0"}
    S.compact_snapshot(spark, tbl, target_files=1)  # v3
    assert S.read_manifest(tbl)["constraints"] == {"amount_pos": "amount > 0"}
    S.restore(tbl, 1)  # v1 had no constraints -> rolled back
    assert S.read_manifest(tbl)["constraints"] == {}
    S.restore(tbl, 2)  # and back again
    assert S.read_manifest(tbl)["constraints"] == {"amount_pos": "amount > 0"}
    S.drop_constraint(tbl, "amount_pos")
    assert S.read_manifest(tbl)["constraints"] == {}
    with pytest.raises(ValueError, match="no constraint"):
        S.drop_constraint(tbl, "amount_pos")


def test_constraints_compose_with_column_mapping(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.rename_column(tbl, "amount", "balance")
    # constraint written against the LOGICAL name; DML enforces it
    S.add_constraint(spark, tbl, "bal_pos", "balance > 0")
    with pytest.raises(ConstraintViolation, match="bal_pos"):
        S.update_where(spark, tbl, [("id", "=", 2)], {"balance": "-1.0"})
    S.update_where(spark, tbl, [("id", "=", 2)], {"balance": "2.0"})
    assert {r["id"]: r["balance"] for r in S.read_snapshot(spark, tbl).collect()}[2] == 2.0


def test_rename_drop_blocked_when_constraint_references_column(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.add_constraint(spark, tbl, "amount_pos", "amount > 0")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        S.rename_column(tbl, "amount", "balance")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        S.drop_column(tbl, "amount")
    S.drop_constraint(tbl, "amount_pos")
    S.rename_column(tbl, "amount", "balance")  # now legal
    assert "balance" in S.read_snapshot(spark, tbl).columns


def test_overwrite_with_unresolvable_constraint_fails_cleanly(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"))
    S.rename_column(tbl, "amount", "balance")
    S.add_constraint(spark, tbl, "bal_pos", "balance > 0")
    v_before = S.latest_version(tbl)
    # fresh frame defines schema (payload has no 'balance'): must fail
    # with the constraint error, not a raw AnalysisException, and
    # publish nothing
    with pytest.raises(ConstraintViolation, match="no longer resolves"):
        S.overwrite_versioned(
            spark, spark.createDataFrame([(1, 2.0)], "id long, amount double"), tbl
        )
    assert S.latest_version(tbl) == v_before
