"""two_phase_agg equivalence + snapshot_diff unit coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.relational import snapshot_diff, two_phase_agg
from kafka_bigdata_jobs_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def test_two_phase_agg_equals_direct(spark):
    ev = load_table(spark, SF, "events")
    direct = {
        (r["event_type"],): (r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    salted = two_phase_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "cents": (
                F.sum(F.round(F.col("value") * 100).cast("long")),
                F.sum("cents"),
            ),
        },
        salt_buckets=8,
        salt_on="user_id",
    )
    got = {(r["event_type"],): (r["n"], r["cents"]) for r in salted.collect()}
    assert got == direct


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["pk", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], ["pk", "s", "v"]
    )
    got = {
        r["pk"]: r["change_type"]
        for r in snapshot_diff(old, new, ["pk"], ["s", "v"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe(spark):
    old = spark.createDataFrame([(1, None, 10)], "pk int, s string, v int")
    new = spark.createDataFrame([(1, None, 10)], "pk int, s string, v int")
    assert snapshot_diff(old, new, ["pk"], ["s", "v"]).count() == 0


def test_snapshot_diff_composite_pk(spark):
    old = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 6), (2, "x", 7)], ["k1", "k2", "v"]
    )
    new = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 60), (3, "z", 8)], ["k1", "k2", "v"]
    )
    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k1", "k2"], ["v"]).collect()
    }
    assert got == {(1, "y"): "changed", (2, "x"): "removed", (3, "z"): "added"}


def test_two_phase_agg_without_salt_column(spark):
    """salt_on=None falls back to monotonically_increasing_id — still
    exactly equal to the direct aggregate within a run."""
    df = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(7)], ["k", "v"]
    )
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = two_phase_agg(
        df,
        keys=["k"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "s": (F.sum("v"), F.sum("s")),
        },
        salt_buckets=4,
    )
    got = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got == direct


def test_series_corr_gram_equals_join(spark):
    """Blocked-Gram pairing emits the same exact integer sums as the
    bucket equi-join, so the final top-k is bit-equal."""
    from kafka_bigdata_jobs_spark.operators.stats import (
        series_corr_pairs,
        series_corr_pairs_gram,
    )
    from kafka_bigdata_jobs_spark.schemas import load_table

    ev = load_table(spark, SF, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    a = series_corr_pairs(daily, "user_id", "day", "cents", 5, 10).collect()
    b = series_corr_pairs_gram(daily, "user_id", "day", "cents", 5, 10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
