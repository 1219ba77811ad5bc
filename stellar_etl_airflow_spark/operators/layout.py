"""Multi-dimensional clustering (Z-order) for data skipping.

The reference's BigQuery tables declare ``clustering_fields`` (e.g.
``["ledger_sequence", "closed_at"]`` — /root/reference/dags/ddls and the
table-creation tasks), which BigQuery uses to co-locate rows so scans
with predicates on those columns read fewer blocks. The parquet-native
equivalent is writing files whose per-column min/max footer ranges are
NARROW on every clustered column at once, so the reader (Spark's parquet
row-group skipping, or any engine reading the footers) can drop whole
files for multi-column predicates.

A total sort achieves that for ONE column (its sort leader); Z-ordering
interleaves the bits of per-column quantile-bucket ids so file ranges are
narrow on ALL clustered columns — the same design as Delta Lake's
``OPTIMIZE ZORDER BY``.

Scale shape: quantile boundaries come from ``approxQuantile``
(Greenwald-Khanna, one pass, driver holds 2^bits scalars per column —
bounded and tiny); bucket mapping and bit interleaving are pure column
expressions; the final clustering is one ``repartitionByRange`` on the
z-value (a single range shuffle, identical cost to the total sort a
single-column layout would need anyway).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(df: DataFrame, col: str) -> Column:
    """Orderable double view of a clusterable column: numerics cast
    directly, timestamps to epoch seconds, dates via timestamp, booleans
    via int. Strings are rejected (a hash would destroy the range
    locality Z-ordering exists to create)."""
    kind = df.schema[col].dataType.typeName()
    c = F.col(col)
    if kind in ("byte", "short", "integer", "long", "float", "double", "decimal"):
        return c.cast("double")
    if kind in ("timestamp", "timestamp_ntz"):
        return c.cast("double")
    if kind == "date":
        return c.cast("timestamp").cast("double")
    if kind == "boolean":
        return c.cast("int").cast("double")
    raise ValueError(
        f"zvalue: column {col!r} has unsupported type {kind} "
        "(numeric/timestamp/date/boolean only — hashing a string would "
        "destroy the range locality clustering depends on)"
    )


def _bucket_col(dcol: Column, boundaries: list[float]) -> Column:
    """0-based quantile bucket id: count of boundaries <= value, as LONG
    (bit positions up to 7 cols x 8 bits = 56 overflow a 32-bit int).

    Computed as a BINARY SEARCH over the literal boundary array —
    log2(2^bits) `element_at` probes per row, all inside whole-stage
    codegen. The previous `size(filter(array, ...))` formulation walked
    all 2^bits boundaries through the INTERPRETED higher-order-function
    path per row (measured r9: the q61 z-order rewrite of sf0.1 lineitem
    spent ~40 s in that filter; ~3 s with the search)."""
    n = len(boundaries)
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    top = 1
    while top * 2 <= n:
        top *= 2
    steps = []
    while top >= 1:
        steps.append(top)
        top //= 2
    # the descent runs as a fold so `idx` is a LAMBDA VARIABLE: an
    # unrolled when-chain would re-inline the accumulated idx subtree
    # 3x per level (2^bits-fold tree growth — hung analysis at bits=8)
    return F.aggregate(
        F.array(*[F.lit(s).cast("long") for s in steps]),
        F.lit(0).cast("long"),
        lambda idx, step: F.when(
            (idx + step <= F.lit(n))
            & (F.element_at(arr, (idx + step).cast("int")) <= dcol),
            idx + step,
        ).otherwise(idx),
    )


def zvalue(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-value column: per-column quantile-bucket ids (``bits`` bits each)
    with their bits interleaved, so sorting by it clusters on every column
    at once. NULLs bucket to 0 (sort first, same as NULLS FIRST).

    The interleave is ONE higher-order fold over an array holding each
    column's bucket id exactly once (r9): the previous per-bit-term
    formulation inlined every bucket's 2^bits-boundary membership filter
    into all ``bits`` of its terms — Catalyst's projection collapse, the
    same trap `training/dedup.py` documents — allocating bits x cols
    boundary arrays PER ROW (measured: 22 s -> ~2 s on sf0.1 lineitem
    for the q61 compaction)."""
    if not cols or len(cols) > 7:
        raise ValueError(f"zvalue: need 1..7 columns, got {len(cols)}")
    if not 1 <= bits <= 8:
        raise ValueError(f"zvalue: bits must be in 1..8, got {bits}")
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE multi-column quantile pass over a double-cast projection (the
    # per-column loop would re-scan the table len(cols) times)
    dnames = [f"_zd{i}" for i in range(len(cols))]
    proj = df.select(*[_as_double(df, c).alias(n) for c, n in zip(cols, dnames)])
    all_bounds = proj.stat.approxQuantile(dnames, qs, 0.01)
    nc = len(cols)
    # bit spreading by LITERAL LOOKUP TABLE: spread_ci[v] interleaves the
    # bits of bucket value v into positions (i*nc + ci) — 2^bits longs
    # precomputed here, one codegen'd element_at per column per row (the
    # fold variants re-derived the bits per row through the interpreted
    # higher-order path)
    def spread_table(ci: int) -> list[int]:
        return [
            sum(((v >> i) & 1) << (i * nc + ci) for i in range(bits))
            for v in range(n_buckets)
        ]

    parts = []
    for ci, (c, bounds) in enumerate(zip(cols, all_bounds)):
        bucket = F.coalesce(
            _bucket_col(_as_double(df, c), bounds), F.lit(0).cast("long")
        )
        table = F.array(*[F.lit(v).cast("long") for v in spread_table(ci)])
        parts.append(F.element_at(table, (bucket + 1).cast("int")))
    return reduce(lambda a, p: a + p, parts[1:], parts[0]).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by z-value (one
    shuffle), sort within partitions, drop the helper column, write
    parquet. Each output file then covers a compact z-range — a small
    min/max window on EVERY clustered column — which is what lets footer
    stats skip files for multi-column predicates."""
    # NO barrier here: the range partitioner's sampling pass evaluates
    # the z expression a second time, but post-r9 that is ~log2(2^bits)
    # codegen probes + one element_at per column per row — one cheap
    # extra scan. A localCheckpoint would materialize the ENTIRE table
    # into executor storage (and is non-reliable under executor loss),
    # which is the wrong trade at 100 TB (review r9).
    z = df.withColumn("_z", zvalue(df, cols, bits))
    part = (
        z.repartitionByRange(target_files, "_z")
        if target_files
        else z.repartitionByRange("_z")
    )
    out = part.sortWithinPartitions("_z").drop("_z")
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
