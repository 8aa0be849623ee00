"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`pipit_spark.queries` — the real registry lives
there so the engine package is self-contained and testable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipit_spark import queries as _Q

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: flat profile (inc/exc time per function) computed
    through the full engine path — canonical trace derivation, fused
    per-(process) stack-matching pass, exclusive-time aggregation."""
    return _Q.q_trace_flat_profile(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
