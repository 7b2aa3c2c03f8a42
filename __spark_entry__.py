"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`kafka_bigdata_jobs_spark.suite`, which pairs
each PySpark query with its DuckDB oracle SQL.  The driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against ``oracle_sql()[name]``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_bigdata_jobs_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary) on /root/testdata/sf0.001."""
    return suite.registry()["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in suite.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in suite.registry().items() if q.oracle is not None
    }
