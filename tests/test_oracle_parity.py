"""Spark-vs-DuckDB parity for every oracle-checked query in the corpus.

This replicates the driver's CORRECTNESS gate locally (sf0.001 by default
for speed; set SPARK_GRAFT_SMOKE_SF to run bigger).
"""

from __future__ import annotations

import pytest

from stellar_etl_airflow_spark.queries import QUERIES

from .conftest import SF_SMOKE
from .oracle import compare

ORACLE_CHECKED = sorted(name for name, spec in QUERIES.items() if spec.oracle)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_SMOKE)
    problems = compare(df, spec.oracle, SF_SMOKE)
    problems.extend(_decimal_columns(df))
    assert not problems, f"{name}: " + " | ".join(problems)


def _decimal_columns(df) -> list[str]:
    """Corpus convention guard (VERDICT r10 #1): no entry may expose a
    DECIMAL column in its FINAL output. The driver's hasher lowers both
    engines' results through pandas, where Spark's ``decimal.Decimal``
    and DuckDB's DECIMAL normalize differently — a hash-red row even
    when values are exactly equal (bit us in r10 on q62/q63, same class
    as the r9 HUGEINT drift). The house discipline is: accumulate in
    DECIMAL(38,6) for exactness, cast the final projection to DOUBLE
    (queries/base.py dsum). This guard makes the convention mechanical
    on the Spark side; test_oracle_no_decimal_output covers the SQL side.
    """
    from pyspark.sql import types as T

    return [
        f"final output column {f.name!r} is {f.dataType.simpleString()} — "
        "cast the final projection to double (dsum discipline)"
        for f in df.schema.fields
        if isinstance(f.dataType, T.DecimalType)
    ]


def test_oracle_no_decimal_output():
    """DESCRIBE every oracle in DuckDB and reject DECIMAL/HUGEINT output
    columns — the SQL-side half of the dsum-discipline guard (cheap: no
    Spark involved, one DESCRIBE per oracle at sf-smoke)."""
    from .oracle import duck_connection

    con = duck_connection(SF_SMOKE)
    bad = []
    try:
        for name in ORACLE_CHECKED:
            for col, dtype, *_ in con.execute(
                "DESCRIBE " + QUERIES[name].oracle
            ).fetchall():
                t = str(dtype).upper()
                if t.startswith("DECIMAL") or t == "HUGEINT":
                    bad.append(f"{name}.{col}: {dtype}")
    finally:
        con.close()
    assert not bad, "oracle output columns must not be DECIMAL/HUGEINT (cast " \
        "to DOUBLE/BIGINT — driver hash normalization differs): " + "; ".join(bad)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
