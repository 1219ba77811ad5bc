"""The r9 CLI ops subcommands (fsck / optimize / restore / clone)
against a real snapshot table — the operational surface an operator
drives without writing Python."""

from __future__ import annotations

import os

from stellar_etl_airflow_spark.sinks import snapshots as S

import stellar_etl_airflow_spark.__main__ as cli


def _tbl(spark, tmp_path) -> str:
    tbl = str(tmp_path / "t")
    S.overwrite_versioned(
        spark, spark.range(40).selectExpr("id as k", "id * 2 as v"), tbl,
        stats_cols=("k",),
    )
    S.overwrite_versioned(
        spark, spark.range(20).selectExpr("id as k", "id * 3 as v"), tbl,
        stats_cols=("k",),
    )
    return tbl


def test_cli_fsck_reports_and_repairs(spark, tmp_path, capsys):
    tbl = _tbl(spark, tmp_path)

    class A:
        table = tbl
        repair = False

    cli._cmd_fsck(A())
    assert "clean" in capsys.readouterr().out
    os.remove(S.read_manifest(tbl)["files"][0])
    cli._cmd_fsck(A())
    assert "MISSING" in capsys.readouterr().out
    A.repair = True
    cli._cmd_fsck(A())
    assert "repaired" in capsys.readouterr().out
    S.read_snapshot(spark, tbl).count()  # reads work again


def test_cli_optimize_restore_clone(spark, tmp_path, capsys):
    tbl = _tbl(spark, tmp_path)

    class O:
        table = tbl
        full = False
        zorder = "k,v"
        target_files = 4

    cli._cmd_optimize(O())
    assert "ZORDER" in capsys.readouterr().out
    assert S.read_snapshot(spark, tbl).count() == 20  # content preserved

    class R:
        table = tbl
        version = 1

    cli._cmd_restore(R())
    assert "restored" in capsys.readouterr().out
    assert S.read_snapshot(spark, tbl).count() == 40  # v1 contents back

    class C:
        src = tbl
        dst = str(tmp_path / "c")
        version = None

    cli._cmd_clone(C())
    assert "zero-copy" in capsys.readouterr().out
    assert S.read_snapshot(spark, C.dst).count() == 40


def test_cli_append_txn_replay(spark, tmp_path, capsys):
    """`append` subcommand (r10): loads a parquet dir transactionally;
    re-running the same --txn is a printed no-op, not a duplicate."""
    tbl = _tbl(spark, tmp_path)
    src = str(tmp_path / "batch")
    spark.range(5).selectExpr("id + 100 as k", "id as v").coalesce(1).write.parquet(src)

    class A:
        pass

    A.src, A.table, A.txn = src, tbl, "load-1"
    cli._cmd_append(A())
    assert "appended" in capsys.readouterr().out
    n1 = S.read_snapshot(spark, tbl).count()
    cli._cmd_append(A())
    assert "replayed" in capsys.readouterr().out
    assert S.read_snapshot(spark, tbl).count() == n1 == 25
