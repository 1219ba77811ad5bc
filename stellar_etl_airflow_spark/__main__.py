"""Command-line surface for the engine — the operational analog of the
reference's DAG entry points (history_table_export / state_table_export /
dbt runs), so a user can drive the same pipeline stages without Airflow:

  python -m stellar_etl_airflow_spark corpus [--sf DIR] [--query NAME]
      Run corpus queries (the SURVEY §2 operator inventory) and print
      row counts; with --query, show the result head too.

  python -m stellar_etl_airflow_spark demo-batch [--warehouse DIR]
      Run one complete 10-minute-batch lifecycle on built-in
      reference-shaped fixtures: plan window -> NDJSON ingest (del/ins
      idempotent) -> MERGE apply-changes -> current-state view ->
      retention + compaction. Prints a stage-by-stage summary.

  python -m stellar_etl_airflow_spark bench
      Defer to the repo-level bench (same as `python bench.py`).

  python -m stellar_etl_airflow_spark history TABLE_DIR
      DESCRIBE HISTORY for a snapshot table: versions, file/byte
      counts, add/remove deltas (sinks/snapshots.py manifests).

  python -m stellar_etl_airflow_spark vacuum TABLE_DIR [--keep N]
      Reclaim unreferenced data files, honoring zero-copy clone
      back-references.

  python -m stellar_etl_airflow_spark zorder SRC DST --cols a,b [--bits N]
      Rewrite a parquet table Z-ordered on the given columns
      (multi-dimensional clustering for footer-stats data skipping).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
from datetime import datetime, timedelta


def _cmd_corpus(args) -> None:
    from .queries import QUERIES
    from .session import get_spark

    spark = get_spark("cli-corpus")
    names = [args.query] if args.query else list(QUERIES)
    for name in names:
        spec = QUERIES[name]
        df = spec.fn(spark, args.sf)
        n = df.count()
        print(f"{name:36s} {n:>8d} rows   {spec.doc}")
        if args.query:
            df.show(10, truncate=False)


def _cmd_demo_batch(args) -> None:
    from pyspark.sql import functions as F

    from .operators import batch as B
    from .operators import maintenance as MX
    from .operators.ingest import Warehouse, ingest_batch
    from .operators.jobs import expire_partitions
    from .operators.merge import latest_changes
    from .session import get_spark
    from .views.currentstate import v_accounts_current

    # reference-shaped fixtures (same shapes as tests/fixtures.py)
    t0 = datetime(2024, 1, 1)
    ledgers = [
        {"sequence": 100 + i, "ledger_hash": f"hash{100 + i}",
         "closed_at": (t0 + timedelta(minutes=5 * i)).isoformat(), "transaction_count": i}
        for i in range(12)
    ]
    changes = [
        {"account_id": "A", "balance": 10.0, "sequence_number": 1, "last_modified_ledger": 100, "ledger_entry_change": 0, "deleted": False},
        {"account_id": "A", "balance": 25.0, "sequence_number": 3, "last_modified_ledger": 103, "ledger_entry_change": 1, "deleted": False},
        {"account_id": "B", "balance": 5.0, "sequence_number": 1, "last_modified_ledger": 101, "ledger_entry_change": 0, "deleted": False},
        {"account_id": "B", "balance": 0.0, "sequence_number": 2, "last_modified_ledger": 105, "ledger_entry_change": 2, "deleted": True},
        {"account_id": "C", "balance": 7.5, "sequence_number": 1, "last_modified_ledger": 102, "ledger_entry_change": 0, "deleted": False},
    ]

    spark = get_spark("cli-demo")
    wh_root = args.warehouse or os.path.join(tempfile.gettempdir(), "spark-etl-demo-wh")
    wh = Warehouse(wh_root)
    recovered = wh.recover()
    print(f"[0] warehouse at {wh_root}" + (f" (recovered: {recovered})" if recovered else ""))

    window = B.plan_batch("demo", t0, t0 + timedelta(minutes=10))
    print(f"[1] planned batch {window.batch_id}: ledgers [{window.start_ledger}, {window.end_ledger}]")

    src = os.path.join(wh_root, "_landing", "accounts.ndjson")
    os.makedirs(os.path.dirname(src), exist_ok=True)
    with open(src, "w") as fh:
        for r in changes:
            fh.write(json.dumps(r) + "\n")

    from pyspark.sql import types as T

    accounts_schema = T.StructType(
        [
            T.StructField("account_id", T.StringType()),
            T.StructField("balance", T.DoubleType()),
            T.StructField("sequence_number", T.LongType()),
            T.StructField("last_modified_ledger", T.LongType()),
            T.StructField("ledger_entry_change", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    df = ingest_batch(spark, wh, "accounts", src, accounts_schema, window)
    print(f"[2] ingested {df.count()} change rows into accounts (del/ins idempotent)")
    # replay the same batch: dynamic partition overwrite keeps it idempotent
    ingest_batch(spark, wh, "accounts", src, accounts_schema, window)
    total = spark.read.parquet(wh.path("accounts")).count()
    print(f"[3] replayed the batch; table still has {total} rows (idempotent)")

    led = spark.createDataFrame(
        [(r["sequence"], r["ledger_hash"], datetime.fromisoformat(r["closed_at"]), r["transaction_count"]) for r in ledgers],
        "sequence long, ledger_hash string, closed_at timestamp, transaction_count long",
    )
    acc = spark.read.parquet(wh.path("accounts")).drop(
        "batch_id", "batch_run_date", "batch_insert_ts", "_p"
    )
    current = v_accounts_current(acc, led)
    rows = {r["account_id"]: (r["balance"], r["deleted"]) for r in current.collect()}
    print(f"[4] v_accounts_current: {rows} (A latest-of-3; B's latest state is its deletion marker)")

    latest = latest_changes(acc, ("account_id",))
    print(f"[5] MERGE source collapse: {latest.count()} latest-per-key rows")

    # materialized state table via THE default apply path (scoped MVCC merge)
    from .operators.merge import apply_changes
    from .sinks import snapshots as S

    state_tbl = wh.path("accounts_state")
    version, touched = apply_changes(spark, acc, state_tbl, ("account_id",), n_buckets=8)
    n_state = S.read_snapshot(spark, state_tbl, version).count()
    print(
        f"[5b] apply_changes -> accounts_state v{version}: {n_state} live rows, "
        f"buckets rewritten {touched} (B deleted by its marker)"
    )

    dropped = expire_partitions(wh, "accounts", older_than_days=100000)
    stats = MX.compact_table(spark, wh.path("accounts"), min_files=2)
    print(f"[6] maintenance: expired={dropped} compacted={ {k.split('/')[-1]: v for k, v in stats.items()} }")
    print("demo-batch complete")


def _cmd_history(args) -> None:
    from .session import get_spark
    from .sinks.snapshots import describe_history

    spark = get_spark("cli-history")
    describe_history(spark, args.table).orderBy("version").show(100, truncate=False)


def _cmd_vacuum(args) -> None:
    from .sinks.snapshots import vacuum

    deleted = vacuum(args.table, keep_versions=args.keep)
    print(f"vacuumed {len(deleted)} files")
    for f in deleted:
        print(f"  {f}")


def _cmd_zorder(args) -> None:
    from .operators.layout import zorder_write
    from .session import get_spark

    spark = get_spark("cli-zorder")
    cols = [c.strip() for c in args.cols.split(",") if c.strip()]
    zorder_write(spark.read.parquet(args.src), args.dst, cols, bits=args.bits)
    print(f"z-ordered {args.src} -> {args.dst} on {cols}")


def _cmd_fsck(args) -> None:
    from .sinks.snapshots import fsck_repair

    missing = fsck_repair(args.table, dry_run=True)
    if not missing:
        print("fsck: clean (every referenced file present)")
        return
    print(f"fsck: {len(missing)} referenced files MISSING")
    for f in missing:
        print(f"  {f}")
    if args.repair:
        fsck_repair(args.table)
        print("repaired: new version published without the missing references")


def _cmd_optimize(args) -> None:
    from .session import get_spark
    from .sinks.snapshots import compact_small_files, compact_snapshot

    spark = get_spark("cli-optimize")
    if args.zorder:
        cols = tuple(c.strip() for c in args.zorder.split(",") if c.strip())
        v = compact_snapshot(spark, args.table, target_files=args.target_files, zorder=cols)
        print(f"OPTIMIZE ZORDER BY {cols}: published v{v}")
    elif args.full:
        v = compact_snapshot(spark, args.table, target_files=args.target_files)
        print(f"OPTIMIZE (full rewrite): published v{v}")
    else:
        v, n = compact_small_files(spark, args.table)
        print(f"OPTIMIZE (bin-packing): v{v}, {n} small files rewritten")


def _cmd_append(args) -> None:
    """Transactional append of a parquet dir/file into a snapshot table;
    ``--txn`` makes a re-run of the same load a no-op (exactly-once)."""
    from .session import get_spark
    from .sinks.snapshots import append_versioned, latest_version

    spark = get_spark("cli-append")
    before = latest_version(args.table)
    v = append_versioned(spark, spark.read.parquet(args.src), args.table, txn_id=args.txn)
    if before is not None and v <= before:
        print(f"append replayed: txn {args.txn!r} already applied at v{v} (no write)")
    else:
        print(f"appended {args.src} -> {args.table} as v{v}")


def _cmd_restore(args) -> None:
    from .sinks.snapshots import restore

    v = restore(args.table, args.version)
    print(f"restored {args.table} to the v{args.version} contents as v{v}")


def _cmd_clone(args) -> None:
    from .sinks.snapshots import clone

    v = clone(args.src, args.dst, version=args.version)
    print(f"cloned {args.src} -> {args.dst} (zero-copy) as v{v}")


def main() -> None:
    ap = argparse.ArgumentParser(prog="stellar_etl_airflow_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("corpus", help="run corpus queries")
    c.add_argument("--sf", default="/root/testdata/sf0.001")
    c.add_argument("--query", default=None)
    c.set_defaults(fn=_cmd_corpus)

    d = sub.add_parser("demo-batch", help="one full batch lifecycle on fixtures")
    d.add_argument("--warehouse", default=None)
    d.set_defaults(fn=_cmd_demo_batch)

    h = sub.add_parser("history", help="DESCRIBE HISTORY for a snapshot table")
    h.add_argument("table")
    h.set_defaults(fn=_cmd_history)

    v = sub.add_parser("vacuum", help="reclaim unreferenced snapshot-table files")
    v.add_argument("table")
    v.add_argument("--keep", type=int, default=1)
    v.set_defaults(fn=_cmd_vacuum)

    z = sub.add_parser("zorder", help="rewrite a parquet table Z-ordered")
    z.add_argument("src")
    z.add_argument("dst")
    z.add_argument("--cols", required=True)
    z.add_argument("--bits", type=int, default=8)
    z.set_defaults(fn=_cmd_zorder)

    f = sub.add_parser("fsck", help="verify (and optionally repair) manifest file references")
    f.add_argument("table")
    f.add_argument("--repair", action="store_true")
    f.set_defaults(fn=_cmd_fsck)

    o = sub.add_parser("optimize", help="compact a snapshot table (bin-packing / full / zorder)")
    o.add_argument("table")
    o.add_argument("--full", action="store_true")
    o.add_argument("--zorder", default=None, help="comma-separated cluster columns")
    o.add_argument("--target-files", type=int, default=None)
    o.set_defaults(fn=_cmd_optimize)

    a = sub.add_parser("append", help="transactional append (txn ledger = exactly-once reloads)")
    a.add_argument("src", help="parquet file/dir to append")
    a.add_argument("table", help="snapshot table path")
    a.add_argument("--txn", default=None, help="idempotency token (re-run = no-op)")
    a.set_defaults(fn=_cmd_append)

    r = sub.add_parser("restore", help="RESTORE a snapshot table to an old version")
    r.add_argument("table")
    r.add_argument("version", type=int)
    r.set_defaults(fn=_cmd_restore)

    k = sub.add_parser("clone", help="zero-copy CLONE of a snapshot table")
    k.add_argument("src")
    k.add_argument("dst")
    k.add_argument("--version", type=int, default=None)
    k.set_defaults(fn=_cmd_clone)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
