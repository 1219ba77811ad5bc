"""BigQuery-schema-JSON -> Spark StructType loader.

The reference pins every table's load schema in a JSON file
(/root/reference/schemas/*.json, 30 files) and loads with
autodetect=False (build_del_ins_from_gcs_to_bq_task.py:140-153). This
module reads that same JSON format and produces the equivalent Spark
schema, with the type mapping from SURVEY.md §1.2:

  STRING->string, INTEGER->long, FLOAT->double, BOOLEAN->boolean,
  TIMESTAMP->timestamp (UTC instant), DATETIME->timestamp_ntz
  (timezone-less batch_run_date), BYTES->binary, JSON->string (Spark has
  no JSON column type; access via get_json_object/from_json),
  RECORD->struct, mode=REPEATED->array.

Additive-only schema evolution (ALLOW_FIELD_ADDITION,
build_del_ins_from_gcs_to_bq_task.py:152) maps to ``merge_additive``.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_SCALAR = {
    "STRING": T.StringType,
    "INTEGER": T.LongType,
    "INT64": T.LongType,
    "FLOAT": T.DoubleType,
    "FLOAT64": T.DoubleType,
    "BOOLEAN": T.BooleanType,
    "BOOL": T.BooleanType,
    "TIMESTAMP": T.TimestampType,
    "DATETIME": T.TimestampNTZType,
    "DATE": T.DateType,
    "BYTES": T.BinaryType,
    "JSON": T.StringType,
    "NUMERIC": lambda: T.DecimalType(38, 9),
    "BIGNUMERIC": lambda: T.DecimalType(38, 9),
}


def _field(spec: dict) -> T.StructField:
    bq_type = spec["type"].upper()
    mode = spec.get("mode", "NULLABLE").upper()
    if bq_type in ("RECORD", "STRUCT"):
        dt: T.DataType = T.StructType([_field(f) for f in spec.get("fields", [])])
    else:
        try:
            dt = _SCALAR[bq_type]()
        except KeyError:
            raise ValueError(f"unsupported BigQuery type: {bq_type}") from None
    if mode == "REPEATED":
        dt = T.ArrayType(dt)
    return T.StructField(spec["name"], dt, nullable=(mode != "REQUIRED"))


def bq_schema_to_struct(fields: list[dict]) -> T.StructType:
    """Convert a BigQuery schema JSON list (``[{name,type,mode,fields}]``)
    into a StructType."""
    return T.StructType([_field(f) for f in fields])


def load_schema_file(path: str) -> T.StructType:
    with open(path) as fh:
        return bq_schema_to_struct(json.load(fh))


def merge_additive(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """ALLOW_FIELD_ADDITION semantics: new top-level fields append; existing
    fields must keep their type (no relaxation/removal here — the reference
    only ever adds columns)."""
    have = {f.name: f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        if f.name not in have:
            out.append(f)
        elif have[f.name].dataType != f.dataType:
            raise ValueError(f"type change for field {f.name}: {have[f.name].dataType} -> {f.dataType}")
    return T.StructType(out)
