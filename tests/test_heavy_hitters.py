"""Frequent-items heavy hitters: exactness precondition and its limit.

`heavy_hitters_census` relies on a documented DataSketches
frequent-items property: counts are EXACT while the number of distinct
items stays under the sketch's tracked capacity (Misra-Gries only
decrements when the map overflows).  Pin (1) the fixture precondition
(vocabulary orders of magnitude below capacity), (2) exact agreement
with a plain groupBy count under that precondition, and (3) the honest
failure mode — with capacity smaller than the distinct count the
sketch's counts are estimates, which is why the query fixes capacity
at 10000 and the docstring states the bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_fixture_vocab_is_far_below_capacity(spark):
    from kafka_bigdata_jobs_spark.operators.textproj import tokenized_documents

    p = tokenized_documents(spark, SF)
    per_source = (
        p.select("source", F.explode("words").alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").alias("v"))
        .agg(F.max("v").alias("max_v"))
        .first()
    )
    assert per_source.max_v < 1000, per_source  # capacity is 10000


def test_sketch_counts_exact_under_capacity(spark):
    df = spark.createDataFrame(
        [(w,) for w in "a a a b b c d d d d".split()], "w: string"
    )
    got = {
        r.item: r["count"]
        for r in df.agg(F.expr("approx_top_k(w, 10, 100)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select("e.item", "e.count")
        .collect()
    }
    assert got == {"a": 3, "b": 2, "c": 1, "d": 4}


def test_overflow_breaks_census_completeness_as_documented(spark):
    # 500 distinct low-frequency items + one heavy item, capacity 8:
    # the heavy hitter survives, but the sketch can no longer report
    # the COMPLETE census — so deterministic full-relation tie-breaking
    # (what makes heavy_hitters_census oracle-hashable) is impossible
    # past capacity.  This is the boundary the query's 10000 capacity
    # and the vocab precondition above consciously avoid.
    rows = [("heavy",)] * 400 + [(f"w{i}",) for i in range(500) for _ in (0, 1)]
    df = spark.createDataFrame(rows, "w: string").coalesce(1)
    got = {
        r.item: r["count"]
        for r in df.agg(F.expr("approx_top_k(w, 8, 8)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select("e.item", "e.count")
        .collect()
    }
    assert "heavy" in got
    assert len(got) < 501, "sketch reported a full census past capacity?"
