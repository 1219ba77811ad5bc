"""Job-level operators: SQL-template insert jobs, retention, catalog loops.

- ``sql_insert_job``: the reference reads dags/queries/{table}.sql,
  formats {project_id}/{dataset_id}/{batch_id}/{batch_run_date}/
  {prev,next}_batch_run_date params, and runs it with a destination table
  and write disposition (build_bq_insert_job_task.py:26-93). Spark twin:
  parameterized spark.sql + mode-mapped save.
- ``expire_partitions``: partition_expiration_days (sandbox tables,
  dags/queries/create_table.sql:2-3) — drops partition directories older
  than the retention window.
- ``cleanup_meta``: engine-metadata retention (the Airflow metastore
  cleanup analog, cleanup_metadata_dag.py) — prunes _meta.batch_runs by
  age.
- ``drop_tables_like`` / ``clone_dataset``: the procedural
  INFORMATION_SCHEMA loops (dag_stellar_dbt_staging_refresh.py:35-55,
  :89-174) become plain Python over the warehouse namespace.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from ..sinks.writer import PART_COL
from .ingest import Warehouse

_DISPOSITION = {"WRITE_APPEND": "append", "WRITE_TRUNCATE": "overwrite", "WRITE_EMPTY": "errorifexists"}


def render_sql_template(template: str, *, batch_id: str, batch_run_date, prev_batch_run_date=None, next_batch_run_date=None, **extra) -> str:
    """Substitute the reference's SQL-template parameters. The
    ``{project_id}.{dataset_id}.`` table prefix resolves to NOTHING — the
    engine's catalog registers bare-named temp views (catalog.py), and
    Spark cannot resolve temp views through qualified names, so the whole
    dotted prefix is stripped rather than substituted.

    Only the documented placeholders are replaced (targeted str.replace,
    not a global ``str.format``): literal braces elsewhere in the SQL —
    regex quantifiers like ``.{2}``, JSON templates in string literals —
    pass through untouched.
    """
    rendered = template.replace("{project_id}.{dataset_id}.", "").replace("`{project_id}.{dataset_id}.", "`")
    params = {
        "project_id": "",
        "dataset_id": "",
        "batch_id": batch_id,
        "batch_run_date": batch_run_date,
        "prev_batch_run_date": prev_batch_run_date,
        "next_batch_run_date": next_batch_run_date,
        **extra,
    }
    for name, value in params.items():
        rendered = rendered.replace("{" + name + "}", str(value))
    return rendered


def sql_insert_job(
    spark: SparkSession,
    wh: Warehouse,
    template: str,
    dest_table: str | None,
    write_disposition: str = "WRITE_APPEND",
    translate: bool = False,
    **params,
) -> DataFrame:
    """Run a rendered SQL statement and land the result with the mapped
    disposition. Source tables must be registered as temp views (the
    engine's catalog layer does this at session setup).

    Templates may be bare SELECTs or full ``INSERT INTO x SELECT ...``
    statements (the reference's dags/queries/update_table.sql shape, r9):
    an INSERT header is parsed off and its table name becomes the
    destination when ``dest_table`` is None — the warehouse addresses
    tables by path, so the ``{target_project}.{target_dataset}`` prefix
    the reference routes with is the caller's Warehouse choice here.
    ``translate=True`` additionally runs the rendered text through
    ``functions.bqcompat.translate_bq_sql`` so the reference's BQ-dialect
    templates run verbatim. ``translate`` is an explicit keyword (ADVICE
    r9): popping it out of ``**params`` silently shadowed any template
    that legitimately renders a ``{translate}`` placeholder — such a
    placeholder now flows through ``params`` untouched. A caller-supplied
    ``dest_table`` that DISAGREES with a parsed INSERT header's table is
    a routing ambiguity and raises (same finding): silently preferring
    the argument sent rows to a different table than the SQL says."""
    rendered = render_sql_template(template, **params)
    if translate:
        from ..functions.bqcompat import translate_bq_sql

        rendered = translate_bq_sql(rendered)
    # leading line comments must not hide an INSERT header from the
    # parse (it would fall into the bare-SELECT path and fail with an
    # opaque table-not-found; review r9)
    body = re.sub(r"(?m)\A(\s*--[^\n]*\n)+", "", rendered)
    m = re.match(r"(?is)\s*insert\s+into\s+`?([\w\-.]+)`?\s*(.*)", body)
    if m:
        parsed = m.group(1).split(".")[-1]
        rendered = m.group(2)
        if rendered.lstrip().startswith("("):
            # INSERT INTO t (a, b) SELECT ...: reordering the SELECT to a
            # column list is not implemented — refuse loudly instead of
            # handing spark.sql an unparseable fragment (review r9)
            raise NotImplementedError(
                "sql_insert_job: INSERT with an explicit column list is not "
                "supported; emit the columns in table order in the SELECT"
            )
        if dest_table is not None and dest_table != parsed:
            raise ValueError(
                f"sql_insert_job: dest_table={dest_table!r} disagrees with the "
                f"template's INSERT INTO {parsed!r}; drop the argument (the "
                "header routes) or align them"
            )
        dest_table = dest_table or parsed
    if dest_table is None:
        raise ValueError("dest_table required for a bare-SELECT template")
    df = spark.sql(rendered)
    df.write.mode(_DISPOSITION[write_disposition]).parquet(wh.path(dest_table))
    return df


def expire_partitions(wh: Warehouse, table: str, older_than_days: int, now: datetime | None = None) -> list[str]:
    """Drop `_p=` month/day partition directories entirely older than the
    retention window. Returns dropped partition names."""
    now = now or datetime.utcnow()
    cutoff = now - timedelta(days=older_than_days)
    root = wh.path(table)
    dropped = []
    if not os.path.isdir(root):
        return dropped
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(f"{PART_COL}="):
            continue
        val = entry.split("=", 1)[1]
        fmt = "%Y-%m-%d" if len(val) == 10 else "%Y-%m"
        try:
            part_start = datetime.strptime(val, fmt)
        except ValueError:
            continue
        # a month partition is expired only when its END is past the cutoff
        part_end = (part_start + timedelta(days=32)).replace(day=1) if fmt == "%Y-%m" else part_start + timedelta(days=1)
        if part_end < cutoff:
            shutil.rmtree(os.path.join(root, entry))
            dropped.append(entry)
    return dropped


def cleanup_meta(spark: SparkSession, wh: Warehouse, older_than_days: int, now: datetime | None = None) -> int:
    """Prune _meta.batch_runs rows older than the retention window
    (copy-on-write rewrite). Returns remaining row count."""
    from pyspark.sql import functions as F

    from .merge import safe_overwrite

    now = now or datetime.utcnow()
    cutoff = now - timedelta(days=older_than_days)
    path = wh.meta_path()
    df = spark.read.parquet(path)
    kept = df.filter(F.col("batch_start") >= F.lit(cutoff))
    n = kept.count()
    safe_overwrite(spark, kept, path)
    # same maintenance cadence (r11): fold the additive ingest counters
    # so reads stop paying O(batches-since-fold). A table that doesn't
    # exist yet or a fold lost to extreme write pressure just waits for
    # the next tick — the pile stays correct either way.
    from ..sinks.snapshots import ConcurrentWriteError
    from .additive_mor import NotAdditiveMorTable
    from .ingest import fold_ingest_counters

    try:
        fold_ingest_counters(spark, wh)
    except (FileNotFoundError, ConcurrentWriteError, NotAdditiveMorTable):
        # not created yet (typed, ADVICE r12 — no message string-matching)
        # or fold lost to write pressure: next tick. Any OTHER ValueError
        # (e.g. read_additive's broken-pin diagnosis) is real corruption
        # and must surface, not silently skip folding forever (ADVICE r11).
        pass
    return n


def list_tables(wh: Warehouse) -> list[str]:
    """Warehouse-catalog iteration (INFORMATION_SCHEMA.TABLES loop)."""
    if not os.path.isdir(wh.root):
        return []
    return sorted(
        d for d in os.listdir(wh.root) if os.path.isdir(os.path.join(wh.root, d)) and not d.startswith("_")
    )


def drop_tables_like(wh: Warehouse, suffix: str) -> list[str]:
    """FOR t IN (SELECT ... WHERE table_name LIKE '%suffix') DO DROP
    (dag_stellar_dbt_staging_refresh.py:35-55)."""
    dropped = []
    for t in list_tables(wh):
        if t.endswith(suffix):
            shutil.rmtree(os.path.join(wh.root, t))
            dropped.append(t)
    return dropped


def clone_dataset(
    spark: SparkSession,
    src: Warehouse,
    dest: Warehouse,
    tables: list[str] | None = None,
    zero_copy: bool = False,
    as_of_ts: float | None = None,
) -> dict[str, str]:
    """Dataset clone loop (staging refresh): per-table copy with per-table
    error capture, mirroring the reference's try/except accumulator
    (dag_stellar_dbt_staging_refresh.py:128-174).

    ``zero_copy=True`` is the parity path for the reference's
    ``CREATE TABLE ... CLONE src FOR SYSTEM_TIME AS OF ts``
    (dag_stellar_dbt_staging_refresh.py:83-88): each table publishes a
    manifest referencing the source's immutable files (sinks/snapshots.py)
    — O(manifest) per table, optionally pinned to the latest snapshot at
    ``as_of_ts``. Source tables without a snapshot log are cloned via
    :func:`snapshots.clone_untracked`: the bootstrap manifest is published
    under the DESTINATION, so cloning never writes into the source
    directory (it may be read-only or concurrently written; see that
    function's caveats). ``zero_copy=False`` keeps the deep copy for
    destinations that must not share storage with the source."""
    from ..sinks import snapshots as S

    results: dict[str, str] = {}
    for t in tables or list_tables(src):
        try:
            if zero_copy:
                if S.latest_version(src.path(t)) is None:
                    S.clone_untracked(src.path(t), dest.path(t), as_of_ts)
                else:
                    version = S.as_of(src.path(t), as_of_ts) if as_of_ts is not None else None
                    S.clone(src.path(t), dest.path(t), version)
            else:
                spark.read.parquet(src.path(t)).write.mode("overwrite").parquet(dest.path(t))
            results[t] = "ok"
        except Exception as exc:  # per-table isolation, loop continues
            results[t] = f"error: {exc}"
    return results


def _is_bucketed(path: str) -> bool:
    from ..sinks import snapshots as S
    from .merge import BUCKET_COL, load_table_props

    # resolve=False: this only scans file name strings — eagerly inlining
    # stats/bloom shard sidecars here would read every shard JSON on a
    # large table for nothing (review r8, same rule as delete_where_dv)
    return load_table_props(path) is not None or any(
        f"{BUCKET_COL}=" in f
        for f in S.read_manifest(path, resolve=False)["files"]
    )


def rename_state_column(spark: SparkSession, path: str, old: str, new: str) -> int:
    """RENAME COLUMN on ANY snapshot table — bucketed ``apply_changes``
    state tables included (r8, VERDICT r7 ask #5). Plain tables get the
    metadata-only column mapping directly; bucketed layouts are first
    compacted to a plain snapshot (``snapshots.unbucket_snapshot`` —
    one content-preserving rewrite, ledger and constraints carried),
    then the zero-rewrite rename applies. A later ``apply_changes``
    re-pins a fresh bucket layout on first use. Returns the version
    publishing the rename."""
    from ..sinks import snapshots as S

    if _is_bucketed(path):
        S.unbucket_snapshot(spark, path)
    return S.rename_column(path, old, new)


def drop_state_column(spark: SparkSession, path: str, name: str) -> int:
    """DROP COLUMN twin of :func:`rename_state_column`."""
    from ..sinks import snapshots as S

    if _is_bucketed(path):
        S.unbucket_snapshot(spark, path)
    return S.drop_column(path, name)


def delete_state_rows_dv(
    spark: SparkSession, path: str, where: list, max_rows: int = 5_000_000
) -> tuple[int, int]:
    """Merge-on-read DELETE on ANY snapshot table — bucketed state
    tables are unbucketed first (their merge path would rewrite buckets
    without consulting vectors), then the deletion-vector sidecar
    records the matches without rewriting data files. For a table that
    keeps receiving ``apply_changes`` batches prefer the copy-on-write
    ``snapshots.delete_where`` (no unbucket needed: the scoped merge
    rewrites affected buckets anyway)."""
    from ..sinks import snapshots as S

    if _is_bucketed(path):
        S.unbucket_snapshot(spark, path)
    return S.delete_where_dv(spark, path, where, max_rows)
