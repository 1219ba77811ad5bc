"""Data-quality gates: the runtime check suite.

Reference counterparts: max_bad_records=0 load gate
(build_del_ins_from_gcs_to_bq_task.py:160), failed-transforms Sentry gate
(:30-52), dbt singular/recency test DAGs (dbt_singular_tests_dag.py:18-37,
dbt_recency_tests_dag.py:17-34), and the per-batch reconciliation records
(build_batch_stats.py:9-43). Checks return structured results; ``enforce``
raises on any failure (the alerting hook point).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    detail: str = ""


class QualityError(ValueError):
    pass


def check_not_empty(df: DataFrame, name: str = "not_empty") -> CheckResult:
    n = df.limit(1).count()
    return CheckResult(name, n > 0, "empty" if n == 0 else "")


def check_unique_key(df: DataFrame, keys: tuple[str, ...], name: str = "unique_key") -> CheckResult:
    dupes = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    return CheckResult(name, dupes == 0, f"duplicate keys on {keys}" if dupes else "")


def check_recency(df: DataFrame, ts_col: str, max_age, now, name: str = "recency") -> CheckResult:
    """Freshness: newest ts_col within max_age of now (recency tests)."""
    newest = df.agg(F.max(ts_col).alias("m")).collect()[0]["m"]
    ok = newest is not None and (now - newest) <= max_age
    return CheckResult(name, ok, f"newest={newest}")


def check_no_nulls(df: DataFrame, cols: tuple[str, ...], name: str = "no_nulls") -> CheckResult:
    cond = None
    for c in cols:
        e = F.col(c).isNull()
        cond = e if cond is None else (cond | e)
    bad = df.filter(cond).limit(1).count()
    return CheckResult(name, bad == 0, f"nulls in {cols}" if bad else "")


def check_row_count_match(a: DataFrame, b: DataFrame, name: str = "row_count_match") -> CheckResult:
    ca, cb = a.count(), b.count()
    return CheckResult(name, ca == cb, f"{ca} != {cb}" if ca != cb else "")


def enforce(results: list[CheckResult]) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        raise QualityError("; ".join(f"{r.name}: {r.detail}" for r in failed))
