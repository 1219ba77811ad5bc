"""Structured Streaming equivalents of the reference's micro-batch pipeline.

The reference is a 10-minute-cadence incremental batch system
(history_tables_dag.py:43) — there is no true streaming, but its concepts
map directly (SURVEY §2.4 streaming-only concepts):

- micro-batch cadence  -> file-source readStream + Trigger.AvailableNow
  (scheduled catch-up runs) or processingTime (resident cadence);
- idempotent del/ins   -> foreachBatch writing through the same
  replace_batch dynamic-partition-overwrite used by batch ingest;
- insert-unique MERGE  -> withWatermark + dropDuplicates on the natural
  key (late duplicates beyond the watermark age out of state);
- batch metadata       -> batch_id = epoch id, stamped per micro-batch.

State stores and watermarks keep executor memory bounded at scale; the
file source tracks processed files so restarts resume exactly-once into
the idempotent sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sinks import writer


def stream_ndjson(spark: SparkSession, landing_dir: str, schema: T.StructType) -> DataFrame:
    """File-source stream over exporter NDJSON drops."""
    return spark.readStream.schema(schema).json(landing_dir)


def stream_ingest(
    stream: DataFrame,
    dest_path: str,
    checkpoint_dir: str,
    batch_run_date,
    partition_field: str = "batch_run_date",
    granularity: str = "month",
    run_alias: str = "stream",
):
    """foreachBatch del/ins: each micro-batch writes through the same
    idempotent (month, batch_id) partition-overwrite as batch ingest, so a
    replayed epoch replaces itself."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        stamped = (
            batch_df.withColumn("batch_id", F.lit(f"{run_alias}-{epoch_id}"))
            .withColumn("batch_run_date", F.lit(batch_run_date).cast("timestamp_ntz"))
            .withColumn("batch_insert_ts", F.current_timestamp())
        )
        writer.replace_batch(stamped, dest_path, partition_field, granularity)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Insert-unique semantics on a stream: duplicates within the watermark
    horizon are dropped; state is bounded by the watermark age."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def windowed_counts(
    stream: DataFrame, ts_col: str, window: str = "10 minutes", watermark: str = "20 minutes"
) -> DataFrame:
    """The cadence analog: per-window event counts with late-data handling."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_events")
    )


def session_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with the built-in session_window — the
    stream twin of the batch gap-cumsum sessionizer (queries q19): a
    session closes after ``gap`` of per-key inactivity."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join within a time horizon: each left event
    pairs with right events for the same ``key`` whose timestamp lands in
    ``[left_ts, left_ts + horizon)`` — the click->conversion attribution
    shape.

    Both sides carry a watermark and the join condition bounds
    ``right_ts`` relative to ``left_ts``, which is exactly what lets
    Structured Streaming evict join state: a buffered left row is dead
    once the right watermark passes ``left_ts + horizon``, so state is
    O(horizon x arrival rate) regardless of stream length. Without the
    time bound the state would grow forever — the condition is load-
    bearing, not an optimization."""
    if left_ts == right_ts or set(left.columns) & set(right.columns) - {key}:
        raise ValueError(
            "interval_join_streams: sides must share only the key column "
            f"(got left={left.columns}, right={right.columns})"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
