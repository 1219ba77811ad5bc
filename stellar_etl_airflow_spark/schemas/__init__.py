from .loader import bq_schema_to_struct, load_schema_file
from .registry import TABLES, TableSpec

__all__ = ["bq_schema_to_struct", "load_schema_file", "TABLES", "TableSpec"]
