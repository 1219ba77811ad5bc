"""Connector corpus entries — the versioned-table stack end to end,
each oracle-checked through a scratch table:

- q55: Data Source WRITE (task-write/driver-commit, executor-side
  stats) + batch READ with Catalyst pushFilters -> manifest pruning;
- s10: Change Data Feed between versions vs a full-outer-diff oracle;
- q56: incremental SCD-2 from CDF deltas (broadcast-anti untouched
  path) vs a declarative validity-range oracle;
- s11: STREAMING snapshot sink, exactly-once micro-batch publication
  via the txn ledger, read back through the connector;
- s12: the full loop streamed — CDF tailed as a stream driving a
  continuously maintained SCD-2 dimension, gated by q56's oracle;
- s13: all FOUR connector surfaces chained — batch write ->
  streaming source -> streaming sink -> batch read, one hash gate;
- q57: the one-pass table profiler (ANALYZE shape).

All have unit suites (tests/test_snapshot_source.py, test_cdf.py,
test_snapshot_writer.py, test_snapshot_stream_sink.py, test_scd2_cdf.py,
test_compact_snapshot.py); these entries put the SEMANTICS behind the
external driver's DuckDB hash gate at sf0.01.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import detach_result, local_df
from .base import QuerySpec, tables


def q55_snapshot_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.read.format("snapshot")`` with REAL Catalyst filter
    pushdown: orders is published as a versioned snapshot table
    (range-layout on ``o_orderkey``, manifest [min,max] stats), then read
    back through the Spark 4 Python Data Source with a plain ``.where``.
    ``pushFilters`` maps the planner's conjuncts onto manifest pruning, so
    the scan plans ONLY the files whose key range may match — asserted
    here against the manifest (the entry fails red if pushdown ever stops
    pruning) — while Spark re-evaluates every filter for exactness.

    Reference parity: BigQuery prunes on clustering-key ranges
    transparently to the SQL (SURVEY §2.1); this is the same contract on
    the snapshot store.

    Since r7 the table is published THROUGH the Data Source's write path
    (``df.write.format("snapshot")`` with ``stats_cols`` — task-write /
    driver-commit, per-file stats computed executor-side), so this one
    entry externally verifies the connector's write AND pushdown-read
    halves end to end.
    """
    from ..sinks import snapshots as S
    from ..sources import snapshot_source

    (orders,) = tables(spark, sf_dir, "orders")
    # pushFilters (SPARK-48921) is opt-in; runtime-settable, and the
    # driver owns its session so set it here, not in get_spark only
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    snapshot_source.register(spark)

    path = os.path.join(tempfile.gettempdir(), f"q55-orders-{uuid.uuid4().hex[:8]}")
    try:
        (
            orders.repartitionByRange(8, "o_orderkey")
            .write.format(snapshot_source.FORMAT_NAME)
            .option("path", path)
            .option("stats_cols", "o_orderkey")
            .mode("overwrite")
            .save()
        )
        n_files = len(S.read_manifest(path)["files"])
        sel = (
            spark.read.format(snapshot_source.FORMAT_NAME)
            .option("path", path)
            .load()
            .where((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000))
            .where(F.col("o_totalprice") > 50000.0)
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        )
        # the pruning proof: input partitions == files surviving the
        # manifest [min,max] check, strictly fewer than the table's files
        # (keys 1000..3000 span a minority of the 8 range files)
        survivors = sel.rdd.getNumPartitions()
        if survivors >= n_files:
            raise AssertionError(
                f"snapshot pushdown pruned nothing: {survivors}/{n_files} files planned"
            )
        sel = detach_result(sel)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return sel


Q55_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey >= 1000 AND o_orderkey < 3000 AND o_totalprice > 50000.0
"""


def s10_cdf_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed between two published versions of a merge table:
    batch 1 seeds latest-per-user state, batch 2 upserts a subset and
    deletes every fifth user; ``read_changes`` recovers the NET row-level
    deltas from manifest file churn alone (cost ∝ rewritten buckets) and
    classifies them Delta-CDF-style. The oracle restates the
    classification declaratively: FULL OUTER JOIN of the two batch
    reductions with insert/delete/update_preimage/update_postimage cases
    — including the two silent cases (a delete for a key that never
    existed emits nothing; an upsert identical to current state emits
    nothing).
    """
    from ..operators.cdf import CHANGE_TYPE_COL, read_changes
    from ..operators.merge import apply_changes

    (ev,) = tables(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", "event_id", "value", F.lit(False).alias("deleted")
    )
    b2 = ev.filter((F.col("event_id") % 3 == 1) & (F.col("user_id") % 2 == 0)).select(
        "user_id", "ts", "event_id", "value",
        (F.col("user_id") % 5 == 0).alias("deleted"),
    )
    path = os.path.join(tempfile.gettempdir(), f"s10-state-{uuid.uuid4().hex[:8]}")
    try:
        v1, _ = apply_changes(
            spark, b1, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        v2, _ = apply_changes(
            spark, b2, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        out = read_changes(spark, path, from_version=v1, to_version=v2).select(
            "user_id", CHANGE_TYPE_COL, "ts", "event_id", "value"
        )
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


S10_SQL = """
WITH b1 AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 0
),
s1 AS (SELECT user_id, ts, event_id, value FROM b1 WHERE rn = 1),
b2 AS (
  SELECT user_id, ts, event_id, value, (user_id % 5 = 0) AS deleted,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 1 AND user_id % 2 = 0
),
c2 AS (SELECT user_id, ts, event_id, value, deleted FROM b2 WHERE rn = 1),
j AS (
  SELECT COALESCE(s1.user_id, c2.user_id) AS user_id,
         s1.user_id IS NOT NULL AS o_present,
         c2.user_id IS NOT NULL AS n_present,
         c2.deleted AS del,
         s1.ts AS o_ts, s1.event_id AS o_eid, s1.value AS o_val,
         c2.ts AS n_ts, c2.event_id AS n_eid, c2.value AS n_val
  FROM s1 FULL OUTER JOIN c2 ON s1.user_id = c2.user_id
),
diff AS (
  SELECT *,
         (o_ts IS DISTINCT FROM n_ts
          OR o_eid IS DISTINCT FROM n_eid
          OR o_val IS DISTINCT FROM n_val) AS row_changed
  FROM j WHERE n_present
)
SELECT user_id, 'insert' AS _change_type, n_ts AS ts, n_eid AS event_id, n_val AS value
FROM diff WHERE NOT del AND NOT o_present
UNION ALL
SELECT user_id, 'delete', o_ts, o_eid, o_val
FROM diff WHERE del AND o_present
UNION ALL
SELECT user_id, 'update_preimage', o_ts, o_eid, o_val
FROM diff WHERE NOT del AND o_present AND row_changed
UNION ALL
SELECT user_id, 'update_postimage', n_ts, n_eid, n_val
FROM diff WHERE NOT del AND o_present AND row_changed
"""


def q56_scd2_from_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD-2 dimension maintenance from the Change Data Feed:
    batch 1 seeds the versioned state table and initialises the history at
    ts1; the CDF between v1 and v2 (inserts / deletes / updates from batch
    2's upserts) drives ``scd2_apply_cdf``, which closes and opens validity
    ranges for churned keys ONLY — the untouched history passes through a
    broadcast anti join, never shuffled (tests/test_scd2_cdf.py pins the
    plan). The oracle restates the whole lifecycle declaratively: a FULL
    OUTER diff of the two batch reductions, emitting [ts1, ts2) closed
    rows for deleted/changed keys, open ts1 rows for untouched keys, and
    open ts2 rows for inserts/new images.

    Reference parity: dag_snapshot.py:118-178 rebuilds dbt snapshots from
    FULL state daily; this is the same history from deltas alone.
    """
    from datetime import datetime

    from ..operators.cdf import CHANGE_TYPE_COL, read_changes
    from ..operators.merge import BUCKET_COL, apply_changes
    from ..operators.scd2 import scd2_apply_cdf, scd2_init
    from ..sinks import snapshots as S

    ts1, ts2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    (ev,) = tables(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", "event_id", "value", F.lit(False).alias("deleted")
    )
    b2 = ev.filter((F.col("event_id") % 3 == 1) & (F.col("user_id") % 2 == 0)).select(
        "user_id", "ts", "event_id", "value",
        (F.col("user_id") % 5 == 0).alias("deleted"),
    )
    path = os.path.join(tempfile.gettempdir(), f"q56-state-{uuid.uuid4().hex[:8]}")
    try:
        v1, _ = apply_changes(
            spark, b1, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        v2, _ = apply_changes(
            spark, b2, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        cols = ["user_id", "ts", "event_id", "value"]
        snap = scd2_init(
            S.read_snapshot(spark, path, v1).drop(BUCKET_COL).select(*cols),
            ("user_id",), ts1,
        )
        ch = read_changes(spark, path, v1, v2).select(*cols, CHANGE_TYPE_COL)
        out = scd2_apply_cdf(snap, ch, ("user_id",), ts2)
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


Q56_SQL = """
WITH b1 AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 0
),
s1 AS (SELECT user_id, ts, event_id, value FROM b1 WHERE rn = 1),
b2 AS (
  SELECT user_id, ts, event_id, value, (user_id % 5 = 0) AS deleted,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 1 AND user_id % 2 = 0
),
c2 AS (SELECT user_id, ts, event_id, value, deleted FROM b2 WHERE rn = 1),
j AS (
  SELECT COALESCE(s1.user_id, c2.user_id) AS user_id,
         s1.user_id IS NOT NULL AS o_present,
         c2.user_id IS NOT NULL AS n_present,
         COALESCE(c2.deleted, FALSE) AS del,
         s1.ts AS o_ts, s1.event_id AS o_eid, s1.value AS o_val,
         c2.ts AS n_ts, c2.event_id AS n_eid, c2.value AS n_val,
         (s1.ts IS DISTINCT FROM c2.ts
          OR s1.event_id IS DISTINCT FROM c2.event_id
          OR s1.value IS DISTINCT FROM c2.value) AS row_changed
  FROM s1 FULL OUTER JOIN c2 ON s1.user_id = c2.user_id
)
SELECT user_id, o_ts AS ts, o_eid AS event_id, o_val AS value,
       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
       CASE WHEN n_present AND (del OR row_changed)
            THEN TIMESTAMP '2024-01-02 00:00:00' END AS valid_to
FROM j WHERE o_present
UNION ALL
SELECT user_id, n_ts, n_eid, n_val,
       TIMESTAMP '2024-01-02 00:00:00', CAST(NULL AS TIMESTAMP)
FROM j WHERE n_present AND NOT del AND (NOT o_present OR row_changed)
"""


def s11_stream_snapshot_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``writeStream.format("snapshot")`` end to end: a file-source
    stream drains through the native streaming Data Source sink
    (per-micro-batch manifest publication, exactly-once via the txn
    ledger — the s09 guarantee moved from ``foreachBatch`` glue into the
    sink itself), then the result is read BACK through the snapshot
    reader. The oracle is the declarative restatement of the pipeline: a
    plain filtered projection of events — so the hash gate certifies the
    sink's append path loses and invents nothing across the
    stream-write/manifest/batch-read round trip. Redelivered-batch
    no-op semantics are pytest-pinned (tests/test_snapshot_stream_sink).
    """
    from ..session import normalize_nanos
    from ..sinks import snapshots as S
    from ..sources import snapshot_source
    from .streamingq import _stream_scratch

    (_ev,) = tables(spark, sf_dir, "events")  # registers confs + view
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the pipeline is stateless (filter + project: no state stores), so it
    # runs on the driver's own session — Python data source registration
    # is per-session and does not follow newSession() children
    snapshot_source.register(spark)  # also pins this thread's active session
    path = os.path.join(tempfile.gettempdir(), f"s11-sink-{uuid.uuid4().hex[:8]}")
    try:
        with _stream_scratch("s11", sf_dir, {"events.parquet": "events.parquet"}) as (
            stream_dir, ckpt,
        ):
            stream = normalize_nanos(spark.readStream.schema(raw_schema).parquet(stream_dir))
            out = stream.where(F.col("event_id") % 5 == 0).select(
                "event_id", "user_id", "ts", "value"
            )
            q = (
                out.writeStream.format(snapshot_source.FORMAT_NAME)
                .option("path", path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        m = S.read_manifest(path)
        if not any(k.startswith("snapshot_stream:") for k in m.get("txns", {})):
            raise AssertionError("stream sink published without a ledger entry")
        back = spark.read.format(snapshot_source.FORMAT_NAME).option("path", path).load()
        back = detach_result(back)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return back


S11_SQL = """
SELECT event_id, user_id, ts, value
FROM events WHERE event_id % 5 = 0
"""


def q57_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column table profile (operators/quality.py::
    profile_table) over lineitem — the ANALYZE/dbt-docs observability op:
    rows / nulls / exact distinct / canonicalized min+max per column in a
    single aggregate job (Spark plans the k-column countDistinct as one
    Expand+shuffle; the approx=True twin removes it at 100 TB). Oracle:
    per-column UNION ALL of the same statistics."""
    from ..operators.quality import profile_table

    (li,) = tables(spark, sf_dir, "lineitem")
    return profile_table(
        li, ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    )


def _q57_col_sql(c: str, expr_min: str, expr_max: str) -> str:
    return f"""
SELECT '{c}' AS column, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       {expr_min} AS min_str, {expr_max} AS max_str
FROM lineitem"""


Q57_SQL = " UNION ALL ".join(
    [
        _q57_col_sql("l_orderkey", "min(l_orderkey)::VARCHAR", "max(l_orderkey)::VARCHAR"),
        _q57_col_sql(
            "l_quantity",
            "round(min(l_quantity), 6)::DECIMAL(38,6)::VARCHAR",
            "round(max(l_quantity), 6)::DECIMAL(38,6)::VARCHAR",
        ),
        _q57_col_sql("l_returnflag", "min(l_returnflag)", "max(l_returnflag)"),
        _q57_col_sql("l_shipdate", "min(l_shipdate)::VARCHAR", "max(l_shipdate)::VARCHAR"),
    ]
)


def s12_stream_cdf_to_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full incremental-dimension LOOP, streaming end to end: a merge
    table's Change Data Feed is TAILED as a stream
    (``readStream.format("snapshot_cdf")``, startingVersion = the
    initialised snapshot's version) and each micro-batch of deltas drives
    ``scd2_apply_cdf`` in ``foreachBatch`` — a continuously maintained
    SCD-2 dimension whose final history must equal q56's batch-computed
    one, and the oracle IS q56's declarative validity-range SQL. This is
    the reference's daily dbt-snapshot rebuilt as: merge table -> CDF
    stream -> incremental dimension, no full-state pass anywhere.
    (The per-batch collect() bridges the foreachBatch child session to
    the driver session's accumulated snapshot — bounded by churn size,
    the corpus-harness pattern.)"""
    from datetime import datetime

    from ..operators.cdf import CHANGE_TYPE_COL
    from ..operators.merge import BUCKET_COL, apply_changes
    from ..operators.scd2 import scd2_apply_cdf, scd2_init
    from ..sinks import snapshots as S
    from ..streaming import cdf_source

    ts1, ts2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    (ev,) = tables(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", "event_id", "value", F.lit(False).alias("deleted")
    )
    b2 = ev.filter((F.col("event_id") % 3 == 1) & (F.col("user_id") % 2 == 0)).select(
        "user_id", "ts", "event_id", "value",
        (F.col("user_id") % 5 == 0).alias("deleted"),
    )
    cols = ["user_id", "ts", "event_id", "value"]
    run = uuid.uuid4().hex[:8]
    path = os.path.join(tempfile.gettempdir(), f"s12-state-{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"s12-ckpt-{run}")
    try:
        v1, _ = apply_changes(
            spark, b1, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        holder = {
            "snap": scd2_init(
                S.read_snapshot(spark, path, v1).drop(BUCKET_COL).select(*cols),
                ("user_id",), ts1,
            ).localCheckpoint(eager=True)
        }
        apply_changes(
            spark, b2, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        cdf_source.register(spark)

        def fb(batch_df, _bid):
            ch = batch_df.select(*cols, CHANGE_TYPE_COL)
            rows = ch.collect()  # child->driver session bridge, churn-sized
            if not rows:
                return
            holder["snap"] = scd2_apply_cdf(
                holder["snap"], local_df(spark, rows, ch.schema, slices=4),
                ("user_id",), ts2,
            ).localCheckpoint(eager=True)

        (
            spark.readStream.format(cdf_source.FORMAT_NAME)
            .option("path", path)
            .option("startingVersion", str(v1))
            .load()
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = holder["snap"]  # already localCheckpoint-detached above
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def s13_snapshot_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four connector surfaces in one loop, oracle-gated: events are
    staged into a versioned table via the BATCH writer, tailed with the
    STREAMING SOURCE (initial-snapshot batch), filtered, published
    through the STREAMING SINK (exactly-once ledger appends), and read
    back with the BATCH reader. The oracle is the declarative
    restatement — a filtered projection of events — so the hash gate
    certifies that rows survive the
    write -> stream-read -> stream-write -> read chain exactly."""
    from ..sinks import snapshots as S
    from ..sources import snapshot_source
    from .base import tables as _tables

    (_ev,) = _tables(spark, sf_dir, "events")
    snapshot_source.register(spark)
    run = uuid.uuid4().hex[:8]
    src = os.path.join(tempfile.gettempdir(), f"s13-src-{run}")
    dst = os.path.join(tempfile.gettempdir(), f"s13-dst-{run}")
    ckpt = os.path.join(tempfile.gettempdir(), f"s13-ckpt-{run}")
    try:
        (
            spark.table("events")
            .filter(F.col("event_id") % 7 == 0)
            .select("event_id", "user_id", "ts", "value")
            .write.format(snapshot_source.FORMAT_NAME)
            .option("path", src).mode("overwrite").save()
        )
        q = (
            spark.readStream.format(snapshot_source.FORMAT_NAME)
            .option("path", src).load()
            .where(F.col("user_id") % 2 == 1)
            .writeStream.format(snapshot_source.FORMAT_NAME)
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        m = S.read_manifest(dst)
        if not any(k.startswith("snapshot_stream:") for k in m.get("txns", {})):
            raise AssertionError("stream sink published without a ledger entry")
        back = spark.read.format(snapshot_source.FORMAT_NAME).option("path", dst).load()
        back = detach_result(back)  # JVM-side detach before cleanup
    finally:
        for d in (src, dst, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    return back


S13_SQL = """
SELECT event_id, user_id, ts, value
FROM events WHERE event_id % 7 = 0 AND user_id % 2 = 1
"""


def q58_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping (RENAME/DROP COLUMN without rewrite) end to end on
    a scratch versioned table built from ``part``:

    v1 overwrite (range layout + [min,max] stats on p_partkey) ->
    v2 RENAME p_retailprice->price -> v3 DROP p_brand -> v4 UPDATE WHERE
    under the LOGICAL name -> pruned scan under the LOGICAL predicate.

    In-entry assertions make the contract externally falsifiable:
    v1->v3 must share an identical file list (the DDL is metadata-only),
    the v1 time-travel read must still see the ORIGINAL names, and the
    final scan must prune files from the physically-keyed stats. The
    returned frame is the current logical state, which the oracle
    restates directly over the source parquet.
    """
    from ..sinks import snapshots as S

    (part,) = tables(spark, sf_dir, "part")
    path = os.path.join(tempfile.gettempdir(), f"q58-part-{uuid.uuid4().hex[:8]}")
    try:
        S.overwrite_versioned(
            spark,
            part.select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
            .repartitionByRange(8, "p_partkey"),
            path,
            stats_cols=["p_partkey"],
        )
        S.rename_column(path, "p_retailprice", "price")
        S.drop_column(path, "p_brand")
        m3 = S.read_manifest(path)
        if sorted(m3["files"]) != sorted(S.read_manifest(path, 1)["files"]):
            raise AssertionError("rename/drop rewrote data files (must be metadata-only)")
        old = S.read_snapshot(spark, path, 1)
        if "p_retailprice" not in old.columns or "price" in old.columns:
            raise AssertionError("time travel must read v1 under its original names")
        S.update_where(spark, path, [("p_partkey", "<", 100)], {"price": "price * 2"})
        # SF-relative scan threshold (40% of the key range) so the
        # pruning assertion holds at every test scale; the oracle
        # computes the identical integer
        thr = (part.agg(F.max("p_partkey")).collect()[0][0] * 2) // 5
        m = S.read_manifest(path)
        pruned = S.prune_files(m, S.translate_where(m, [("p_partkey", "<=", thr)]))
        if len(pruned) >= len(m["files"]):
            raise AssertionError(
                f"stats pruning under the logical name pruned nothing: "
                f"{len(pruned)}/{len(m['files'])}"
            )
        sel = S.scan_snapshot(spark, path, [("p_partkey", "<=", thr)]).select(
            "p_partkey", "p_name", "price", "p_size"
        )
        sel = detach_result(sel)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return sel


Q58_SQL = """
SELECT p_partkey, p_name,
       CASE WHEN p_partkey < 100 THEN p_retailprice * 2 ELSE p_retailprice END AS price,
       p_size
FROM part WHERE p_partkey <= (SELECT (max(p_partkey) * 2) // 5 FROM part)
"""


def q59_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE end to end: two deletion-vector deletes on a
    scratch versioned copy of ``orders`` — in-entry assertions pin that
    NO data file changes across the DV versions (the delete is a
    position-list sidecar) and that time travel still reads the
    pre-delete row count — then the current logical state is returned
    for the hash gate. The oracle restates the surviving rows directly.
    """
    from ..sinks import snapshots as S

    (orders,) = tables(spark, sf_dir, "orders")
    path = os.path.join(tempfile.gettempdir(), f"q59-orders-{uuid.uuid4().hex[:8]}")
    try:
        S.overwrite_versioned(
            spark,
            orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .repartitionByRange(8, "o_orderkey"),
            path,
            stats_cols=["o_orderkey"],
        )
        n0 = S.read_snapshot(spark, path).count()
        files_v1 = sorted(S.read_manifest(path)["files"])
        _, n_f = S.delete_where_dv(spark, path, [("o_orderstatus", "=", "F")])
        _, n_p = S.delete_where_dv(spark, path, [("o_totalprice", ">", 200000.0)])
        m = S.read_manifest(path)
        if sorted(m["files"]) != files_v1:
            raise AssertionError("DV delete rewrote data files (must be sidecar-only)")
        if sum(m["dv"]["counts"].values()) != n_f + n_p:
            raise AssertionError("DV counts do not add up across merged deletes")
        if S.read_snapshot(spark, path, 1).count() != n0:
            raise AssertionError("time travel must still see pre-delete rows")
        sel = S.read_snapshot(spark, path)
        sel = detach_result(sel)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return sel


Q59_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE NOT (o_orderstatus = 'F') AND NOT (o_totalprice > 200000.0)
"""


def q60_state_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema surgery on a DEFAULT bucketed apply_changes state table
    (r8, VERDICT r7 ask #5) end to end: two MERGE batches build the
    state (upserts + deleted->DELETE), then the jobs-level wrappers
    take the bucketed table through RENAME COLUMN and a
    deletion-vector DELETE — each auto-unbucketing exactly once via
    ``snapshots.unbucket_snapshot``. In-entry assertions pin the
    contract: the rename publishes NO new data files over the unbucket
    rewrite (metadata-only), the DV delete publishes NO new data files
    over the rename (sidecar-only), and the txn ledger carries through
    the whole surgery (exactly-once survives). The oracle restates the
    merge + rename + delete declaratively over ``customer``."""
    from ..operators import jobs as J
    from ..operators.merge import apply_changes
    from ..sinks import snapshots as S

    (customer,) = tables(spark, sf_dir, "customer")
    b1 = customer.select(
        "c_custkey",
        F.col("c_acctbal").alias("balance"),
        "c_mktsegment",
        F.lit(False).alias("deleted"),
        F.lit(1).cast("long").alias("last_modified_ledger"),
        F.lit(1).alias("ledger_entry_change"),
    )
    b2 = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100).alias("balance"),
        "c_mktsegment",
        (F.col("c_custkey") % 15 == 0).alias("deleted"),
        F.lit(2).cast("long").alias("last_modified_ledger"),
        F.lit(1).alias("ledger_entry_change"),
    )
    path = os.path.join(tempfile.gettempdir(), f"q60-state-{uuid.uuid4().hex[:8]}")
    try:
        apply_changes(spark, b1, path, ("c_custkey",), n_buckets=8, txn_id="b1")
        apply_changes(spark, b2, path, ("c_custkey",), n_buckets=8, txn_id="b2")
        v_ren = J.rename_state_column(spark, path, "balance", "acct_balance")
        m_ren = S.read_manifest(path)
        if sorted(m_ren["files"]) != sorted(S.read_manifest(path, v_ren - 1)["files"]):
            raise AssertionError("rename rewrote data files (must be metadata-only)")
        if any("_p=" in f for f in m_ren["files"]):
            raise AssertionError("surgery left the bucketed layout in place")
        v_del, _ = J.delete_state_rows_dv(
            spark, path, [("c_mktsegment", "=", "BUILDING")]
        )
        m = S.read_manifest(path)
        if sorted(m["files"]) != sorted(m_ren["files"]):
            raise AssertionError("DV delete rewrote data files (must be sidecar-only)")
        if not {"b1", "b2"} <= set(m.get("txns") or {}):
            raise AssertionError("txn ledger lost across the surgery")
        sel = S.read_snapshot(spark, path).select(
            "c_custkey", "acct_balance", "c_mktsegment"
        )
        sel = detach_result(sel)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return sel


Q60_SQL = """
WITH merged AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS acct_balance,
         c_mktsegment
  FROM customer
  WHERE NOT (c_custkey % 15 = 0)
)
SELECT c_custkey, acct_balance, c_mktsegment
FROM merged WHERE NOT (c_mktsegment = 'BUILDING')
"""


SPECS: dict[str, QuerySpec] = {
    "q55_snapshot_pushdown": QuerySpec(
        q55_snapshot_pushdown,
        Q55_SQL,
        "batch snapshot Data Source: Catalyst pushFilters -> manifest file pruning, exact results",
    ),
    "q58_column_mapping": QuerySpec(
        q58_column_mapping,
        Q58_SQL,
        "RENAME/DROP COLUMN without rewrite: metadata-only DDL, logical DML + pruned scan, time travel",
    ),
    "q59_deletion_vectors": QuerySpec(
        q59_deletion_vectors,
        Q59_SQL,
        "merge-on-read DELETE: deletion-vector sidecars, zero file rewrites, time travel intact",
    ),
    "q60_state_surgery": QuerySpec(
        q60_state_surgery,
        Q60_SQL,
        "bucketed state table through auto-unbucket + RENAME + DV DELETE, ledger carried (r8)",
    ),
    "s10_cdf_net_changes": QuerySpec(
        s10_cdf_net_changes,
        S10_SQL,
        "Change Data Feed between versions == declarative full-outer diff oracle",
    ),
    "q56_scd2_from_cdf": QuerySpec(
        q56_scd2_from_cdf,
        Q56_SQL,
        "incremental SCD-2 from CDF deltas == declarative validity-range oracle",
    ),
    "s11_stream_snapshot_sink": QuerySpec(
        s11_stream_snapshot_sink,
        S11_SQL,
        "native streaming snapshot sink: exactly-once micro-batch appends, read back via the connector",
    ),
    "q57_table_profile": QuerySpec(
        q57_table_profile,
        Q57_SQL,
        "one-pass per-column profile: rows/nulls/exact-distinct/canonical min-max",
    ),
    "s12_stream_cdf_to_scd2": QuerySpec(
        s12_stream_cdf_to_scd2,
        Q56_SQL,
        "streamed CDF -> incrementally maintained SCD-2 dimension == q56's declarative oracle",
    ),
    "s13_snapshot_stream_roundtrip": QuerySpec(
        s13_snapshot_stream_roundtrip,
        S13_SQL,
        "all four connector surfaces chained: write -> stream-read -> stream-write -> read",
    ),
}





# ---------------------------------------------------------------------------
# q61 — OPTIMIZE ... ZORDER BY through the driver gate (r9): multi-column
# clustering rewrite + stats-pruned two-column scan, content identical.
# ---------------------------------------------------------------------------


def q61_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem published as a versioned snapshot, OPTIMIZE'd with
    ``compact_snapshot(zorder=(l_partkey, l_suppkey))``, then scanned
    with a TWO-column predicate through the manifest [min,max] stats.
    The entry asserts the clustering actually prunes (strictly fewer
    files planned than the table holds — z-order is what makes BOTH
    columns' per-file ranges tight simultaneously) and returns the exact
    rows, which the oracle restates as a plain filter. Time travel keeps
    the pre-OPTIMIZE version readable; content equality across the
    rewrite is the row-hash gate itself.

    Reference parity: BigQuery multi-column clustering
    (`airflow_variables_prod.json` cluster_fields; SURVEY §1.3) — same
    contract, explicit engine."""
    from ..sinks import snapshots as S

    (li,) = tables(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"]
    path = os.path.join(tempfile.gettempdir(), f"q61-li-{uuid.uuid4().hex[:8]}")
    try:
        S.overwrite_versioned(
            spark, li.select(*cols), path,
            stats_cols=("l_partkey", "l_suppkey"),
        )
        S.compact_snapshot(
            spark, path, target_files=16, zorder=("l_partkey", "l_suppkey")
        )
        n_files = len(S.read_manifest(path)["files"])
        # scale-relative selectivity (a 5% x 20% box) so the entry works
        # at every sf; integer arithmetic keeps the oracle's thresholds
        # (same expressions in SQL) exactly equal
        mx = li.agg(
            F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
        ).first()
        where = [
            ("l_partkey", "<", int(mx["p"]) * 5 // 100),
            ("l_suppkey", "<", int(mx["s"]) * 20 // 100),
        ]
        # count SURVIVING FILES from the manifest stats directly:
        # rdd.getNumPartitions() measures Spark's scan bin-packing, not
        # pruning — small files pack into fewer partitions (vacuous pass)
        # and big files split into more (spurious fail at larger sf)
        # (review r9)
        man = S.read_manifest(path, resolve=False)
        survivors = len(S.prune_files(man, S.translate_where(man, list(where))))
        if n_files >= 4 and survivors >= n_files:
            raise AssertionError(
                f"zorder pruned nothing: {survivors}/{n_files} files survive"
            )
        sel = S.scan_snapshot(spark, path, where)
        sel = detach_result(sel)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return sel


Q61_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_partkey < (SELECT max(l_partkey) * 5 // 100 FROM lineitem)
  AND l_suppkey < (SELECT max(l_suppkey) * 20 // 100 FROM lineitem)
"""

SPECS["q61_zorder_optimize"] = QuerySpec(
    q61_zorder_optimize,
    Q61_SQL,
    "OPTIMIZE ZORDER BY: multi-column clustering rewrite, stats-pruned 2-column scan, exact content",
)


def q62_transactional_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional APPEND exactly-once, end to end (r10): orders is
    split into three batches and appended to a fresh snapshot table via
    ``append_versioned`` with per-batch txn ids — and the middle batch
    is deliberately REDELIVERED (the foreachBatch retry shape), plus
    two of the appends race a ``compact_small_files`` maintenance pass
    interleaved between them (the ledger must ride through it, VERDICT
    r9 ask #6). The final table must equal orders EXACTLY — the oracle
    aggregates the raw table, so any duplicated or dropped batch breaks
    the value hash. The redelivered txn must also return its originally
    recorded version (asserted in-entry) and publish nothing.

    100 TB shape: each append stages only its batch's files and
    publishes a manifest CAS; a replay costs one manifest read, the
    maintenance pass costs the small files it bin-packs — nothing
    corpus-sized moves. Reference parity: the NDJSON-batch append loads
    (`build_del_ins_from_gcs_to_bq_task.py`) whose idempotency the
    reference gets from delete+insert; here the txn ledger provides it
    without the delete."""
    from ..sinks import snapshots as S

    (orders,) = tables(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    path = os.path.join(tempfile.gettempdir(), f"q62-app-{uuid.uuid4().hex[:8]}")
    try:
        batches = [
            orders.where(F.col("o_orderkey") % 3 == i).select(*cols) for i in range(3)
        ]
        S.append_versioned(spark, batches[0], path, txn_id="b0")
        v1 = S.append_versioned(spark, batches[1], path, txn_id="b1")
        S.compact_small_files(spark, path)  # maintenance between appends
        replay = S.append_versioned(spark, batches[1], path, txn_id="b1")
        if replay != v1:
            raise AssertionError(f"replayed txn returned v{replay}, recorded v{v1}")
        S.append_versioned(spark, batches[2], path, txn_id="b2")
        out = (
            S.read_snapshot(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                # dsum discipline (queries/base.py): accumulate in DECIMAL(38,6)
                # for exactness, project the FINAL column as DOUBLE — the driver
                # hash contract normalizes doubles identically on both sides,
                # raw Decimal objects it does not (r10 red-row root cause).
                F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                .cast("double")
                .alias("total_price"),
            )
        )
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


Q62_SQL = """
SELECT o_orderstatus,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
"""

SPECS["q62_transactional_append"] = QuerySpec(
    q62_transactional_append,
    Q62_SQL,
    "transactional append: 3 batches + a redelivered txn + interleaved compaction == plain orders",
)


def q63_additive_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate MERGE-ON-READ end to end (r10): per-customer order
    counters maintained as pure delta appends — three batches (one
    REDELIVERED), a fold that materializes one row per key mid-stream,
    then two more deltas on top of the folded base. The final folded
    view must equal a one-shot GROUP BY over orders (the oracle); the
    redelivered txn must no-op ACROSS the fold (the ledger is carried).

    100 TB story: this is the contention-free additive state shape —
    same-key writers never read, never conflict, never recompute
    (measured in tools/concurrency_storm.py; the bucketed CoW additive
    merge paid 61 recomputes for the same workload). Reads pay a fold
    over O(rows-since-fold); ``fold_additive`` on maintenance cadence
    bounds it. Amounts ride DECIMAL(38,6) — exact-summable, so folds
    are order-independent."""
    from ..operators import additive_mor as AM

    (orders,) = tables(spark, sf_dir, "orders")
    cols = [
        F.col("o_custkey"),
        F.lit(1).cast("long").alias("n_orders"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("total_price"),
    ]
    path = os.path.join(tempfile.gettempdir(), f"q63-mor-{uuid.uuid4().hex[:8]}")
    try:
        batches = [
            orders.where(F.col("o_orderkey") % 5 == i).select(*cols) for i in range(5)
        ]
        keys, sums = ("o_custkey",), ("n_orders", "total_price")
        AM.write_delta(spark, batches[0], path, keys, sums, txn_id="b0")
        AM.write_delta(spark, batches[1], path, keys, sums, txn_id="b1")
        AM.write_delta(spark, batches[2], path, keys, sums, txn_id="b2")
        AM.fold_additive(spark, path)
        v = S_latest(path)
        AM.write_delta(spark, batches[1], path, keys, sums, txn_id="b1")  # redelivery
        if S_latest(path) != v:
            raise AssertionError("replayed delta published across the fold")
        AM.write_delta(spark, batches[3], path, keys, sums, txn_id="b3")
        AM.write_delta(spark, batches[4], path, keys, sums, txn_id="b4")
        # dsum discipline: the OPERATOR keeps exact DECIMAL state (folds must
        # be order-independent); the ENTRY projects the final column as DOUBLE
        # so the driver hash normalizes identically vs DuckDB (r10 red row).
        out = AM.read_additive(spark, path).withColumn(
            "total_price", F.col("total_price").cast("double")
        )
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


def S_latest(path):
    from ..sinks.snapshots import latest_version

    return latest_version(path)


Q63_SQL = """
SELECT o_custkey,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY o_custkey
"""

SPECS["q63_additive_mor"] = QuerySpec(
    q63_additive_mor,
    Q63_SQL,
    "aggregate merge-on-read: delta appends + mid-stream fold + cross-fold replay == GROUP BY oracle",
)


def q64_ingest_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 ingest-counter lifecycle end to end (r11, VERDICT r10 ask #5):
    orders is treated as three per-status ingest feeds, each landing in
    TWO batches; every batch records a (n_batches, n_rows) delta on the
    additive-MoR counter table (`operators/ingest.py::
    record_ingest_counters`), one batch is REDELIVERED (the del/ins
    rerun shape — the txn ledger must no-op it), and a maintenance fold
    runs mid-stream (folds must carry the ledger AND rebase over any
    interleaving). The folded view must equal a one-shot GROUP BY over
    orders — any double-counted replay, lost delta, or fold swallow
    breaks the value hash.

    100 TB shape: each counter write is one 1-row delta append (no
    read, no conflict — N concurrent table ingests never serialize);
    reads fold O(batches-since-fold) rows. Reference parity: the
    reconciliation counts build_batch_stats.py:9-43 derives from its
    lineage inserts, here maintained incrementally and exactly-once."""
    from datetime import datetime as _dt

    from ..operators.batch import BatchWindow
    from ..operators.ingest import (
        Warehouse,
        fold_ingest_counters,
        read_ingest_counters,
        record_ingest_counters,
    )

    (orders,) = tables(spark, sf_dir, "orders")
    root = os.path.join(tempfile.gettempdir(), f"q64-cnt-{uuid.uuid4().hex[:8]}")
    wh = Warehouse(root)
    t0 = _dt(2024, 1, 1)
    w = BatchWindow("q64-run", t0, t0, t0, 0, 0)
    try:
        statuses = [r["o_orderstatus"] for r in orders.select("o_orderstatus").distinct().collect()]
        counts = {
            (r["o_orderstatus"], r["half"]): r["n"]
            for r in orders.groupBy(
                "o_orderstatus", (F.col("o_orderkey") % 2).alias("half")
            ).count().withColumnRenamed("count", "n").collect()
        }
        for s in sorted(statuses):
            record_ingest_counters(spark, wh, w, s, counts.get((s, 0), 0))
        fold_ingest_counters(spark, wh)  # maintenance mid-stream
        for s in sorted(statuses):
            # second batch per feed, under a distinct logical window
            w1 = BatchWindow("q64-run-b1", t0, t0, t0, 1, 1)
            record_ingest_counters(spark, wh, w1, s, counts.get((s, 1), 0))
            # REDELIVERY of the first batch: ledger rode through the fold
            record_ingest_counters(spark, wh, w, s, counts.get((s, 0), 0))
        out = read_ingest_counters(spark, wh)
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


Q64_SQL = """
SELECT o_orderstatus AS table_name,
       2::BIGINT AS n_batches,
       count(*)::BIGINT AS n_rows
FROM orders
GROUP BY o_orderstatus
"""

SPECS["q64_ingest_counters"] = QuerySpec(
    q64_ingest_counters,
    Q64_SQL,
    "D6 additive-MoR ingest counters: 2 batches/feed + redelivered batch + mid-stream fold == GROUP BY oracle",
)


# ---------------------------------------------------------------------------
# q67 — MERGE WITH SCHEMA EVOLUTION through apply_changes (r12, VERDICT
# r11 ask #7): the reference evolves its state tables with BigQuery's
# ALLOW_FIELD_ADDITION on the UPSERT path (the MERGE in
# build_apply_gcs_changes_to_bq_task.py — q54 covers only the APPEND
# path). Batch 1 seeds latest-per-user state; batch 2 arrives carrying
# a NEW column (`segment`) plus deletes, applied with
# allow_schema_evolution=True. The final read must show: untouched
# users with segment NULL (old files are schema-narrower — the
# mixed-schema read fills the gap), upserted users with batch 2's
# values AND segment, deleted users gone. The oracle restates the whole
# lifecycle declaratively from events.
# ---------------------------------------------------------------------------


def q67_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import apply_changes
    from ..sinks import snapshots as S

    (ev,) = tables(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts", "event_id", "value", F.lit(False).alias("deleted")
    )
    b2 = ev.filter((F.col("event_id") % 3 == 1) & (F.col("user_id") % 2 == 0)).select(
        "user_id", "ts", "event_id", "value",
        (F.col("user_id") % 5 == 0).alias("deleted"),
        F.concat(F.lit("seg-"), (F.col("user_id") % 4).cast("string")).alias("segment"),
    )
    path = os.path.join(tempfile.gettempdir(), f"q67-state-{uuid.uuid4().hex[:8]}")
    try:
        apply_changes(
            spark, b1, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id")
        )
        apply_changes(
            spark, b2, path, ("user_id",), n_buckets=8, order_cols=("ts", "event_id"),
            allow_schema_evolution=True,
        )
        out = S.read_snapshot(spark, path).select(
            "user_id", "ts", "event_id", "value", "segment"
        )
        out = detach_result(out)  # JVM-side detach before cleanup
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


Q67_SQL = """
WITH b1 AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 0
),
s1 AS (SELECT user_id, ts, event_id, value FROM b1 WHERE rn = 1),
b2 AS (
  SELECT user_id, ts, event_id, value, (user_id % 5 = 0) AS deleted,
         'seg-' || CAST(user_id % 4 AS VARCHAR) AS segment,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_id % 3 = 1 AND user_id % 2 = 0
),
c2 AS (SELECT user_id, ts, event_id, value, deleted, segment FROM b2 WHERE rn = 1)
SELECT COALESCE(c2.user_id, s1.user_id) AS user_id,
       COALESCE(c2.ts, s1.ts) AS ts,
       COALESCE(c2.event_id, s1.event_id) AS event_id,
       COALESCE(c2.value, s1.value) AS value,
       c2.segment AS segment
FROM s1 FULL OUTER JOIN c2 ON s1.user_id = c2.user_id
WHERE NOT COALESCE(c2.deleted, FALSE)
"""

SPECS["q67_merge_schema_evolution"] = QuerySpec(
    q67_merge_schema_evolution,
    Q67_SQL,
    "MERGE upsert with ALLOW_FIELD_ADDITION: batch adds a column, old rows read NULL, deletes apply",
)
