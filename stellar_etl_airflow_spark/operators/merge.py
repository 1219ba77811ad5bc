"""MERGE semantics for state tables, expressed as DataFrame algebra.

The reference applies ledger-entry change batches with a BigQuery MERGE
(build_apply_gcs_changes_to_bq_task.py:116-149):

  WHEN MATCHED AND source.deleted THEN DELETE
  WHEN MATCHED THEN UPDATE SET <all columns>
  WHEN NOT MATCHED THEN INSERT <all columns>

and a dedup-append variant (:152-181):

  WHEN NOT MATCHED THEN INSERT  (insert-unique)

On a Delta/Iceberg deployment these are literal ``MERGE INTO`` statements;
this module implements the identical semantics over plain parquet as

  target(kept) = target left_anti changes(keys)
  result       = kept UNION latest-change-per-key WHERE NOT deleted

which is exactly the copy-on-write plan a MERGE compiles to. The rewrite
is atomic via write-temp-then-swap (``safe_overwrite``).

Changes within one batch may contain several versions of a key; the
MERGE source is first collapsed to the latest version per key with the
same ordering the current-state views use (last_modified_ledger DESC,
ledger_entry_change DESC — v_accounts_current.sql:30-33).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_changes(
    changes: DataFrame,
    keys: tuple[str, ...],
    order_cols: tuple[str, ...] = ("last_modified_ledger", "ledger_entry_change"),
) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*[F.col(c).desc() for c in order_cols])
    return changes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: tuple[str, ...],
    deleted_col: str = "deleted",
    order_cols: tuple[str, ...] = ("last_modified_ledger", "ledger_entry_change"),
) -> DataFrame:
    """Apply a change batch to the current state. Column sets must match
    (the reference generates the UPDATE/INSERT column list from the pinned
    schema, build_apply_gcs_changes_to_bq_task.py:42-75, including the
    reserved-word escape for ``order``/``from``/``to`` — moot here because
    DataFrame columns are never re-parsed as SQL)."""
    cols = target.columns
    src = latest_changes(changes.select(*cols), keys, order_cols)
    kept = target.join(src.select(*keys), list(keys), "left_anti")
    applied = src.filter(~F.coalesce(F.col(deleted_col), F.lit(False)))
    return kept.unionByName(applied)


def insert_unique(target: DataFrame, new_rows: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """MERGE ... WHEN NOT MATCHED THEN INSERT — dedup append for
    history/orderbook data (build_apply_gcs_changes_to_bq_task.py:152-181).
    Returns only the rows to append (caller appends; no rewrite needed)."""
    return new_rows.join(target.select(*keys), list(keys), "left_anti")


#: backup-directory prefix. Dot-prefixed so Spark/Hadoop path filters skip
#: it during partition discovery — a crash that leaves a backup nested deep
#: in a partition tree (e.g. mid-compaction) must not surface as a bogus
#: partition value or duplicate rows in table scans.
BACKUP_PREFIX = ".bak-"


def backup_path(path: str) -> str:
    """Sibling backup dir used by :func:`safe_overwrite` during the swap."""
    parent, name = os.path.split(os.path.abspath(path))
    return os.path.join(parent, BACKUP_PREFIX + name)


def recover_overwrite(path: str) -> bool:
    """Recover from a ``safe_overwrite`` interrupted between its two
    renames: if only the ``.bak-<name>`` sibling exists, the new directory
    never landed — rename the old data back. Returns True if a recovery
    happened. Call at startup (``Warehouse.recover`` runs it across the
    whole tree) before reading state tables."""
    old = backup_path(path)
    if os.path.isdir(old) and not os.path.exists(path):
        os.rename(old, path)
        return True
    return False


def safe_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Copy-on-write table rewrite: write to a temp dir, then swap. Plain
    parquet cannot be read and overwritten in one job; Delta/Iceberg do
    this natively via the transaction log.

    Crash-safety: the temp dir is a SIBLING of ``path`` (same filesystem),
    so both swap steps are atomic ``os.rename`` calls — never a recursive
    copy. The only non-atomic window is between the two renames; a crash
    there leaves ``.bak-<name>`` holding the full previous table, which
    :func:`recover_overwrite` restores on startup. The backup is deleted
    only after the new directory is in place, and its dot prefix keeps it
    invisible to Spark partition discovery even when ``path`` is a leaf
    deep inside a partition tree (compaction)."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".merge-tmp-{uuid.uuid4().hex}")
    old = backup_path(path)
    try:
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)  # leftover from a prior completed swap
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
    except BaseException:
        # failed before the final rename: put the previous table back and
        # drop the partial temp output
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if os.path.exists(old):
        shutil.rmtree(old)
