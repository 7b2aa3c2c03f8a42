"""Runtime bloom-filter join pruning fires and preserves results.

The 100 TB claim of operators/joins.py::with_runtime_filter is a plan
shape: a selective dimension filter must materialize as a
``bloom_filter_agg`` build over the dim keys and a ``might_contain``
probe pushed into the FACT side, before the shuffle.  Asserting that on
the optimized plan (not just timings) makes the pruning a pinned
contract; a result-equality check guards against over-pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.joins import (
    RUNTIME_FILTER_CONF,
    with_runtime_filter,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def runtime_filter_session(spark):
    saved = {}
    for k in RUNTIME_FILTER_CONF:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # Force a shuffle join: broadcast joins don't need (or get) the
    # bloom filter, and the fixture dim would otherwise broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    with_runtime_filter(spark)
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _filtered_fact_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
    )


def test_bloom_filter_injected_into_fact_scan(runtime_filter_session):
    plan = (
        _filtered_fact_join(runtime_filter_session)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan
    # The probe must land on the FACT side: the might_contain filter
    # references the lineitem key, not the orders key.
    probe_lines = [l for l in plan.splitlines() if "might_contain" in l]
    assert any("l_orderkey" in l for l in probe_lines), probe_lines


def test_pruning_preserves_results(runtime_filter_session):
    spark = runtime_filter_session
    with_filter = _filtered_fact_join(spark).collect()[0]
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = _filtered_fact_join(spark).collect()[0]
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert (with_filter.n, with_filter.cents) == (without.n, without.cents)
    assert with_filter.n > 0
