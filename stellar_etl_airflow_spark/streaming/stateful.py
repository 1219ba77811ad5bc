"""Custom stateful streaming operators via applyInPandasWithState.

The pattern for operators Spark's built-ins can't express (SURVEY §7 /
task guidance path (b)): per-key state maintained across micro-batches
with an explicit state schema, Arrow-batched per group. State lives in
the state store (checkpointed, bounded by timeouts) — restarts resume.

``running_counts`` is the canonical example: a per-key running event
count + sum, the streaming twin of the reconciliation counters the
reference keeps in batch_stats.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})


def running_counts(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) across micro-batches. Update mode:
    each batch emits the refreshed totals for keys it touched."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
