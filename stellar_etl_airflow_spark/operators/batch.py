"""Batch planner: interval arithmetic, batch identity, backfill chunking.

Driver-side pure functions (no Spark needed) reproducing the reference's
batch protocol:

- interval shift: the batch processes the PREVIOUS interval
  (dags/stellar_etl_airflow/macros.py:1-11 subtracts one schedule interval
  from the data-interval start).
- batch identity: batch_id = "{run_id}-{alias}" (macros.py:14-15); every
  row additionally carries batch_run_date (DATETIME, timezone-less) and
  batch_insert_ts (wall clock) (build_export_task.py:143-147).
- end-ledger overlap trim: export ranges are half-open; the exporter runs
  [start, max(start, end-1)] so adjacent batches don't double-count the
  boundary ledger (build_export_task.py:75-80).
- time->ledger resolution: the reference shells out to
  `stellar-etl get_ledger_range_from_times` (build_time_task.py:40-49);
  here a deterministic protocol-level mapping (genesis epoch + fixed
  close cadence) that tests and fixtures share.
- backfill chunking: a [start, end) date range is split into N-hour
  sequential windows (backfill_controller.py:25-53,76-80).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

GENESIS = datetime(2015, 9, 30, 16, 46, 54)  # protocol genesis close time
LEDGER_CLOSE_SECONDS = 5


@dataclass(frozen=True)
class BatchWindow:
    batch_id: str
    batch_run_date: datetime  # timezone-less (DATETIME semantics)
    interval_start: datetime
    interval_end: datetime
    start_ledger: int
    end_ledger: int  # inclusive, overlap-trimmed


def shift_interval(data_interval_start: datetime, data_interval_end: datetime) -> datetime:
    """batch_run_date = interval start shifted back one interval."""
    return data_interval_start - (data_interval_end - data_interval_start)


def batch_id_for(run_id: str, alias: str = "cc") -> str:
    return f"{run_id}-{alias}"


def ledger_range_from_times(start: datetime, end: datetime) -> tuple[int, int]:
    """Deterministic time->sequence mapping (ledger 2 closed at GENESIS,
    one ledger every LEDGER_CLOSE_SECONDS). Returns a half-open [lo, hi)
    sequence range covering [start, end)."""
    if end <= start:
        raise ValueError("end must be after start")
    lo = 2 + max(0, int((start - GENESIS).total_seconds() // LEDGER_CLOSE_SECONDS))
    hi = 2 + max(0, int((end - GENESIS).total_seconds() // LEDGER_CLOSE_SECONDS))
    return lo, max(lo, hi)


def trim_end_ledger(start_ledger: int, end_ledger: int) -> int:
    """Half-open -> inclusive with overlap trim: max(start, end - 1)."""
    return max(start_ledger, end_ledger - 1)


def plan_batch(run_id: str, data_interval_start: datetime, data_interval_end: datetime, alias: str = "cc") -> BatchWindow:
    brd = shift_interval(data_interval_start, data_interval_end)
    interval = data_interval_end - data_interval_start
    t0, t1 = brd, brd + interval
    lo, hi = ledger_range_from_times(t0, t1)
    return BatchWindow(
        batch_id=batch_id_for(run_id, alias),
        batch_run_date=brd,
        interval_start=t0,
        interval_end=t1,
        start_ledger=lo,
        end_ledger=trim_end_ledger(lo, hi),
    )


def chunk_backfill(start: datetime, end: datetime, hours: int = 6) -> list[tuple[datetime, datetime]]:
    """Split [start, end) into sequential windows of at most ``hours``."""
    if not 1 <= hours <= 24:
        raise ValueError("chunk size must be 1..24 hours")
    out = []
    cur = start
    step = timedelta(hours=hours)
    while cur < end:
        nxt = min(cur + step, end)
        out.append((cur, nxt))
        cur = nxt
    return out
