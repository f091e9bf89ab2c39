"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness surface;
implemented in ``data_observability_installer_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_observability_installer_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full 25-test-type DQ suite on sf0.001 lineitem."""
    return registry.QUERIES["dq_suite_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
