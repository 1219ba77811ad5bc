"""Shared helpers for the volume probes (review r13: the id-offset
replication loop was implemented three separate times across
variant/merge-evolution/sqlfn probes; one definition keeps the offset
scheme — and therefore the cross-probe volume ratios in SCALE.md —
comparable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_replicas(df: DataFrame, k: int, offsets: dict[str, int]) -> DataFrame:
    """Union K copies of ``df``, shifting each id column in ``offsets``
    by ``replica_index * offset`` (cast through long so an int32 column
    never overflows — the r13 variant-probe bug). Rows stay distinct
    across replicas while every replica keeps the base shape/cardinality
    profile; offsets must exceed the column's value range (10**12 for
    event-scale ids, 10**9 for user-scale ids)."""
    parts = []
    for r in range(k):
        rep = df
        for col, off in offsets.items():
            rep = rep.withColumn(
                col, F.col(col).cast("long") + F.lit(r).cast("long") * F.lit(off).cast("long")
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
