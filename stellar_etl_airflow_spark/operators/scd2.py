"""SCD-2 snapshotter: the dbt-snapshot equivalent.

The reference snapshots state tables daily (dag_snapshot.py:118-178,
dag_snapshot_pricing_data.py:114-156): each natural key keeps a history of
versions with [valid_from, valid_to) ranges, the open version having
valid_to NULL. Semantically identical to the LEAD()-built validity windows
of v_liquidity_pool_trade_volume.sql:37-41, but maintained incrementally.

``scd2_apply`` is a pure DataFrame transform: given the existing snapshot
and the new state-as-of ``snapshot_ts``, it returns the next snapshot:

- unchanged open rows pass through;
- changed/removed keys get their open row closed (valid_to = ts);
- new/changed keys insert a fresh open row (valid_from = ts).

Change detection hashes the tracked columns (md5 of concat) — one
broadcast-friendly join, no per-column comparisons in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(cols: list[str]):
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))


def scd2_init(state: DataFrame, keys: tuple[str, ...], snapshot_ts) -> DataFrame:
    ts = F.lit(snapshot_ts).cast("timestamp")
    return state.withColumn("valid_from", ts).withColumn("valid_to", F.lit(None).cast("timestamp"))


def scd2_apply(
    snapshot: DataFrame,
    state: DataFrame,
    keys: tuple[str, ...],
    snapshot_ts,
    check_unique: bool = True,
) -> DataFrame:
    # Duplicate natural keys in the incoming state would fan out the join
    # below and break the one-open-row-per-key invariant; BigQuery's MERGE
    # fails loudly on duplicate source keys — so do we.
    if check_unique:
        dupes = state.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
        if dupes:
            raise ValueError(f"duplicate natural keys in state on {keys}; dedup the batch first")
    ts = F.lit(snapshot_ts).cast("timestamp")
    tracked = [c for c in state.columns if c not in keys]
    closed = snapshot.filter(F.col("valid_to").isNotNull())
    open_rows = snapshot.filter(F.col("valid_to").isNull())

    cur = open_rows.withColumn("_h", _row_hash(tracked))
    new = state.withColumn("_h", _row_hash(tracked))

    key_cols = list(keys)
    # keys whose content changed or disappeared -> close the open row
    matched = cur.alias("c").join(new.select(*key_cols, "_h").alias("n"), key_cols, "left")
    unchanged = matched.filter(F.col("n._h") == F.col("c._h")).select("c.*").drop("_h")
    to_close = (
        matched.filter(F.col("n._h").isNull() | (F.col("n._h") != F.col("c._h")))
        .select("c.*")
        .drop("_h")
        .withColumn("valid_to", ts)
    )
    # new keys or changed content -> fresh open row
    to_open = (
        new.alias("n")
        .join(cur.select(*key_cols, "_h").alias("c"), key_cols, "left")
        .filter(F.col("c._h").isNull() | (F.col("c._h") != F.col("n._h")))
        .select("n.*")
        .drop("_h")
        .withColumn("valid_from", ts)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    return closed.unionByName(unchanged).unionByName(to_close).unionByName(to_open)


def scd2_apply_cdf(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: tuple[str, ...],
    snapshot_ts,
) -> DataFrame:
    """Incremental SCD-2 maintenance from a Change Data Feed.

    ``scd2_apply`` re-reads the FULL new state every snapshot — the dbt
    snapshot shape the reference runs daily (dag_snapshot.py:118-178). When
    the state table is versioned by :func:`..operators.merge.apply_changes`,
    :func:`..operators.cdf.read_changes` already yields exactly the keys
    that moved, so the dimension can be maintained from the deltas alone:

    - ``insert``            -> fresh open row (valid_from = ts)
    - ``delete``            -> close the key's open row (valid_to = ts)
    - ``update_postimage``  -> close open row + fresh open row
    - ``update_preimage``   -> ignored (the snapshot already holds it)

    Scale shape: the churned-key set is small relative to the dimension
    history, so untouched rows pass through a **broadcast anti join** —
    the big snapshot side is never shuffled, unlike ``scd2_apply`` whose
    hash-join keys the whole open set against the whole new state. At
    100 TB this is the difference between touching every history file and
    touching none of them (pair with a bucketed/merge-backed history sink
    to rewrite only churned buckets).

    Equivalent by construction to ``scd2_apply(snapshot, full_new_state)``
    whenever ``snapshot``'s open rows equal the table state the CDF range
    starts from (property-tested in tests/test_scd2_lifecycle.py).
    """
    from .cdf import CHANGE_TYPE_COL, COMMIT_VERSION_COL

    ts = F.lit(snapshot_ts).cast("timestamp")
    kl = list(keys)
    drop_meta = [c for c in (CHANGE_TYPE_COL, COMMIT_VERSION_COL) if c in changes.columns]
    ch = changes.filter(F.col(CHANGE_TYPE_COL) != "update_preimage")
    touched = ch.select(*kl).distinct()

    untouched = snapshot.join(F.broadcast(touched), kl, "left_anti")
    t_hist = snapshot.join(F.broadcast(touched), kl, "left_semi")
    # a touched key's CLOSED rows are immutable history; only its open row
    # (if any — a re-insert after delete has none) closes at ts
    closed_hist = t_hist.filter(F.col("valid_to").isNotNull())
    newly_closed = t_hist.filter(F.col("valid_to").isNull()).withColumn("valid_to", ts)
    opens = (
        ch.filter(F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"))
        .drop(*drop_meta)
        .withColumn("valid_from", ts)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    return untouched.unionByName(closed_hist).unionByName(newly_closed).unionByName(opens)


def current_of(snapshot: DataFrame) -> DataFrame:
    return snapshot.filter(F.col("valid_to").isNull()).drop("valid_from", "valid_to")


def as_of(snapshot: DataFrame, ts) -> DataFrame:
    """Point-in-time read over the validity ranges (time travel)."""
    t = F.lit(ts).cast("timestamp")
    return snapshot.filter((F.col("valid_from") <= t) & (F.col("valid_to").isNull() | (F.col("valid_to") > t))).drop(
        "valid_from", "valid_to"
    )
