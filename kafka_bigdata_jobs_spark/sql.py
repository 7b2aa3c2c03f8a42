"""SQL entry surface: temp-view registration + spark.sql passthrough.

The engine is DataFrame-first (the reference never calls spark.sql —
SURVEY.md §3), but a user migrating SQL workloads gets the same
Catalyst plans by registering the canonical tables as temp views and
writing ANSI SQL against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TEST_TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, tables=TEST_TABLES) -> None:
    """Register each driver table as a session temp view."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the registered tables (views auto-registered)."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
