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
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
