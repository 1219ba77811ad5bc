"""Batch Python Data Source over versioned snapshot tables with REAL
Catalyst filter pushdown into manifest pruning —
``spark.read.format("snapshot").option("path", t).load()``.

``scan_snapshot`` already skips files from manifest [min, max] stats
and bloom filters, but callers must hand it ``where=`` tuples. This
source closes the loop the way a native connector does: Spark 4.1's
``DataSourceReader.pushFilters`` (SPARK-48921 Python filter-pushdown
API) hands the planner's conjunctive filters to the source, which maps
them onto the SAME manifest pruning decision — so a plain

    spark.read.format("snapshot").option("path", t).load()
         .where(F.col("h") == probe)

plans only the files whose blooms/stats may match, with zero special
API at the call site. Three pruning layers, each at its natural level:

1. FILE skip at planning time (driver): manifest stats + blooms via
   :func:`~stellar_etl_airflow_spark.sinks.snapshots.prune_files`;
2. ROW-GROUP skip at read time (executor): the same predicates handed
   to pyarrow's ``read_table(filters=...)``, which consults parquet
   row-group statistics;
3. ROW filter by Spark: pushFilters returns every filter (partial
   pushdown — the source skips containers, Spark keeps semantics), so
   results are exact even when stats lie low.

``read`` yields Arrow RecordBatches (the API's vectorized path), cast
to the table's unified schema so additively-evolved old files surface
missing columns as nulls.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from ..sinks import snapshots as S

FORMAT_NAME = "snapshot"

_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
}

#: filter value types that compare safely against JSON manifest stats
_SAFE_TYPES = (str, int, float, bool)


def _spark_safe(fld):
    """Spark's Arrow bridge rejects nanosecond timestamps (INT96
    parquet, Spark's own default output, reads back as timestamp[ns]);
    surface them as microseconds. INT96 is UTC-adjusted, so attach UTC
    when the file carries no zone."""
    import pyarrow as pa

    t = fld.type
    if pa.types.is_timestamp(t) and t.unit == "ns":
        return fld.with_type(pa.timestamp("us", tz=t.tz or "UTC"))
    return fld


def _unified_arrow_schema(files: list[str]):
    """Union of the files' parquet schemas, first-seen field order
    (additive evolution keeps old-schema files alive)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields: dict[str, object] = {}
    for f in files:
        for fld in pq.ParquetFile(f).schema_arrow:
            if fld.name != "_p":  # bucket layout dir, not table data
                fields.setdefault(fld.name, _spark_safe(fld))
    return pa.schema(list(fields.values()))


@dataclass
class _FilePartition(InputPartition):
    files: list = field(default_factory=list)
    where: list = field(default_factory=list)


class _SnapshotReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._path = options["path"]
        v = options.get("version")
        self._version = int(v) if v is not None else None
        self._manifest = S.read_manifest(self._path, self._version)
        self._where: list = []
        self._files_per_task = int(options.get("filespertask", 1) or 1)
        # unified schema computed ONCE driver-side (footer reads);
        # pa.Schema pickles with the reader to every task
        self._schema_arrow = _unified_arrow_schema(self._manifest["files"])

    def pushFilters(self, filters):
        for f in filters:
            t = type(f)
            op = _OPS.get(t)
            if op and len(f.attribute) == 1:
                v = list(f.value) if t is In else f.value
                vals = v if isinstance(v, list) else [v]
                if all(isinstance(x, _SAFE_TYPES) for x in vals):
                    self._where.append((f.attribute[0], op, v))
            # partial pushdown: the source only skips FILES/row groups,
            # so every filter is returned for Spark to re-evaluate
            yield f

    def partitions(self):
        files = S.prune_files(self._manifest, self._where)
        n = max(1, self._files_per_task)
        groups = [files[i : i + n] for i in range(0, len(files), n)]
        return [
            _FilePartition(files=g, where=list(self._where)) for g in groups
        ] or [_FilePartition()]

    def read(self, partition: _FilePartition):
        if not partition.files:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_filters = _pyarrow_filters(partition.where)
        for f in partition.files:
            try:
                tbl = pq.read_table(f, filters=pa_filters)
            except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
                tbl = pq.read_table(f)  # incomparable filter types: read all
            tbl = _align(tbl, self._schema_arrow)
            yield from tbl.to_batches()


def _pyarrow_filters(where):
    """Our (col, op, v) tuples in pyarrow's DNF filter dialect — this is
    what turns manifest-level file pruning into ROW-GROUP pruning via
    the parquet footer stats pyarrow consults."""
    if not where:
        return None
    out = []
    for col, op, v in where:
        out.append((col, "==" if op == "=" else op, v))
    return out


def _align(tbl, schema):
    """Project/cast an (old-schema) file table to the unified schema,
    null-filling absent columns."""
    import pyarrow as pa

    cols = []
    for fld in schema:
        if fld.name in tbl.column_names:
            cols.append(tbl.column(fld.name).cast(fld.type))
        else:
            cols.append(pa.nulls(len(tbl), type=fld.type))
    return pa.Table.from_arrays(cols, schema=schema)


class SnapshotSource(DataSource):
    """``spark.read.format("snapshot")``. Options: ``path`` (table dir,
    required), ``version`` (time travel; default latest),
    ``filesPerTask`` (files grouped per input partition; default 1)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        m = S.read_manifest(
            self.options["path"],
            int(self.options["version"]) if self.options.get("version") else None,
        )
        return from_arrow_schema(_unified_arrow_schema(list(m["files"])))

    def reader(self, schema: StructType) -> _SnapshotReader:
        opts = {k.lower(): v for k, v in self.options.items()}
        opts["path"] = self.options["path"]
        return _SnapshotReader(opts)


def register(spark) -> None:
    """Register for this session; afterwards
    ``spark.read.format("snapshot")`` resolves."""
    spark.dataSource.register(SnapshotSource)
