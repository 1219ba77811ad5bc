"""Schema-enforced NDJSON reader with a zero-bad-record gate.

The reference loads exporter output (newline-delimited JSON on GCS) with a
pinned schema, autodetect off, and ``max_bad_records=0`` — any malformed
row fails the load (build_del_ins_from_gcs_to_bq_task.py:143-203, gate at
:160; the Custom operator additionally fails when the exporter reported
failed_transforms > 0, :30-52).

Spark equivalent: PERMISSIVE read with a ``_corrupt_record`` rescue column
and an assertion that it is everywhere-null. The count runs on the rescue
column only (column-pruned scan), then the clean projection is returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class BadRecordsError(ValueError):
    pass


class FailedTransformsError(ValueError):
    pass


CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_bad_records: int = 0,
    failed_transforms: int = 0,
    max_failed_transforms: int = 0,
) -> DataFrame:
    """Read NDJSON with the pinned schema; fail if corrupt rows exceed the
    budget (default 0) or the upstream exporter reported failed transforms
    (the Sentry-fatal gate at build_del_ins_from_gcs_to_bq_task.py:38-52)."""
    if failed_transforms > max_failed_transforms:
        raise FailedTransformsError(
            f"exporter reported {failed_transforms} failed transforms (max {max_failed_transforms})"
        )
    with_rescue = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = spark.read.schema(with_rescue).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)
    # Gate scan: Spark refuses plans whose referenced columns are ONLY the
    # corrupt column, and column pruning strips a merely-selected sibling —
    # so the probe AGGREGATES over a real field alongside the corrupt
    # indicator. Two scans of one 10-min NDJSON slice == BigQuery's
    # validate-then-load; no cache, nothing leaks in long-lived sessions.
    aggs = [F.sum(F.col(CORRUPT_COL).isNotNull().cast("int")).alias("bad")]
    if schema.fields:
        aggs.append(F.count(F.col(schema.fields[0].name)).alias("_touch"))
    bad = df.agg(*aggs).collect()[0]["bad"] or 0
    if bad > max_bad_records:
        raise BadRecordsError(f"{bad} corrupt NDJSON rows in {path} (max {max_bad_records})")
    # within-budget corrupt rows are SKIPPED (BigQuery max_bad_records
    # semantics), never returned as all-null rows
    clean = df.filter(F.col(CORRUPT_COL).isNull()) if bad else df
    return clean.drop(CORRUPT_COL)


def stamp_batch_columns(df: DataFrame, batch_id: str, batch_run_date, batch_insert_ts=None) -> DataFrame:
    """Attach the idempotency/lineage triplet stamped on every exported row
    (build_export_task.py:143-147)."""
    ts = F.lit(batch_insert_ts).cast("timestamp") if batch_insert_ts is not None else F.current_timestamp()
    return (
        df.withColumn("batch_id", F.lit(batch_id))
        .withColumn("batch_run_date", F.lit(batch_run_date).cast("timestamp_ntz"))
        .withColumn("batch_insert_ts", ts)
    )
