from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from stellar_etl_airflow_spark.session import get_spark

    s = get_spark("stellar-etl-spark-tests")
    yield s
    s.stop()
