from .bqcompat import (  # noqa: F401
    bq_dayofweek,
    json_extract_array,
    json_extract_scalar,
    safe_divide,
    timestamp_diff,
    translate_bq_sql,
)
