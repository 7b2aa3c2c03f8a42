"""Every oracle-backed suite query must match DuckDB at sf0.001.

This is a local mirror of the driver's CORRECTNESS gate (the driver runs
the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from kafka_bigdata_jobs_spark import suite

from .oracle_harness import compare, duckdb_conn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


ORACLE_QUERIES = sorted(
    name for name, q in suite.registry().items() if q.oracle is not None
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, con, name):
    q = suite.registry()[name]
    df = q.fn(spark, SF)
    problems = compare(df, con, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


ROWS_ONLY = sorted(name for name, q in suite.registry().items() if q.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = suite.registry()[name]
    df = q.fn(spark, SF)
    assert df.count() >= 0 and len(df.columns) > 0
