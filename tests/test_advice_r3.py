"""Regression tests for the round-2 ADVICE findings: NULL-safe left-mode
range-join add-back, atomic multi-column as-of fill, tree-walking overwrite
recovery (in test_advice_r2), and simhash bits forwarding."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stellar_etl_airflow_spark.operators.asof import asof_join
from stellar_etl_airflow_spark.operators.rangejoin import bucketed_range_join
from stellar_etl_airflow_spark.training.dedup import (
    simhash,
    simhash_neardup_pairs,
    simhash_neardup_pairs_banded,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_range_join_left_null_fact_columns_not_duplicated(spark):
    """A matched fact row carrying a NULL column must appear exactly once.
    The old add-back anti-joined on ALL fact columns with plain equality,
    so any NULL column made a matched row 'unmatched' again (duplicate
    output with NULL interval columns)."""
    facts = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T06:00:00"), None),  # matched, NULL payload
            ("u1", _ts("2024-03-01T06:00:00"), "x"),  # outside every interval
            ("u2", _ts("2024-01-01T06:00:00"), None),  # no interval for u2 at all
        ],
        "key string, ts timestamp, payload string",
    )
    intervals = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 10.0)],
        "key string, valid_from_ts timestamp, valid_to_ts timestamp, price double",
    )
    rows = bucketed_range_join(
        facts, intervals, key="key", fact_ts="ts", bucket="1 day", how="left"
    ).collect()
    assert len(rows) == 3  # one row per fact, no spurious add-back
    by_key_ts = {(r["key"], r["ts"]): r for r in rows}
    assert by_key_ts[("u1", _ts("2024-01-01T06:00:00"))]["price"] == 10.0
    assert by_key_ts[("u1", _ts("2024-03-01T06:00:00"))]["price"] is None
    assert by_key_ts[("u2", _ts("2024-01-01T06:00:00"))]["price"] is None


def test_range_join_left_duplicate_fact_rows_survive(spark):
    """Two identical unmatched fact rows must both come back (the surrogate
    row id distinguishes them; a column-equality anti-join would not)."""
    facts = spark.createDataFrame(
        [("u9", _ts("2024-01-01T06:00:00")), ("u9", _ts("2024-01-01T06:00:00"))],
        "key string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("other", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 1.0)],
        "key string, valid_from_ts timestamp, valid_to_ts timestamp, price double",
    )
    rows = bucketed_range_join(
        facts, intervals, key="key", fact_ts="ts", bucket="1 day", how="left"
    ).collect()
    assert len(rows) == 2
    assert all(r["price"] is None for r in rows)


def test_asof_join_atomic_row_semantics_with_nulls(spark):
    """The matched right row's values attach as ONE unit: a NULL in the
    latest matching row must survive (not fall back to an older row), and
    two value columns must never mix values from different right rows."""
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01T12:00:00"), 1)], "key string, ts timestamp, row_id int"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T09:00:00"), 100.0, "old"),
            ("k", _ts("2024-01-01T11:00:00"), None, "new"),  # latest: NULL price
        ],
        "key string, ts timestamp, price double, tag string",
    )
    (row,) = asof_join(left, right, on="key", value_cols=["price", "tag"]).collect()
    assert row["tag"] == "new"
    assert row["price"] is None  # genuine NULL from the winning row survives


def test_simhash_banded_forwards_bits(spark):
    """banded(bits=32) must band a 32-bit sketch — same pair set as the
    all-pairs filter over the same 32-bit sketches (exact-recall pigeonhole
    breaks if a 60-bit sketch is banded with 32-bit widths)."""
    docs = spark.createDataFrame(
        [(i, f"common words shared by all docs plus token{i % 3} and tok{i % 7}") for i in range(24)],
        "doc_id long, text string",
    )
    s32 = simhash(docs, bits=32)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(docs, max_hamming=4, sketches=s32).collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs_banded(docs, max_hamming=4, bits=32).collect()
    }
    assert banded == exact
    assert exact  # the fixture must actually produce near-dup pairs
    # sanity: 32-bit sketches fit in 32 bits
    assert all(0 <= r["simhash"] < (1 << 32) for r in s32.collect())
