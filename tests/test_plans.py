"""JobSpec composition tests (batch + streaming mode dispatch)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.plans.spec import JobSpec
from kafka_bigdata_jobs_spark.schemas import load_table
from kafka_bigdata_jobs_spark.operators.relational import count_if

SF = "/root/testdata/sf0.001"


def _agg(df):
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        count_if(F.col("value") > 100).alias("n_big"),
    )


def test_batch_spec(spark):
    spec = JobSpec(
        name="events_summary",
        source=lambda s: load_table(s, SF, "events"),
        transforms=[lambda df: df.where(F.col("value") > 0), _agg],
    )
    out = spec.run_batch(spark)
    assert out.count() == 5
    assert set(out.columns) == {"event_type", "n", "n_big"}


def test_batch_spec_rejects_stream(spark):
    from kafka_bigdata_jobs_spark.sources.stream_files import read_parquet_stream
    from tests.test_streaming import EVENTS_SCHEMA

    with tempfile.TemporaryDirectory() as d:
        load_table(spark, SF, "events").coalesce(1).write.mode("overwrite").parquet(d)
        spec = JobSpec(
            name="stream_spec",
            source=lambda s: read_parquet_stream(s, d, EVENTS_SCHEMA),
        )
        with pytest.raises(ValueError, match="use run_stream"):
            spec.run_batch(spark)


def test_observe_metrics_single_pass(spark):
    """source_stats_observed's Observation yields input telemetry from
    the same job that computes the aggregate — no second count()."""
    from pyspark.sql import Observation

    docs = load_table(spark, SF, "documents")
    obs = Observation("input_stats")
    instrumented = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
    )
    out = (
        instrumented.where(F.col("text").isNotNull())
        .groupBy("source")
        .count()
        .collect()
    )
    got = obs.get
    assert got["rows_in"] == docs.count()
    assert got["null_texts"] == docs.where(F.col("text").isNull()).count()
    assert sum(r["count"] for r in out) == got["rows_in"] - got["null_texts"]


def test_quantize_int8_zero_vector_guard(spark):
    from kafka_bigdata_jobs_spark.operators.similarity import quantize_int8_stats

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "label int, embedding array<float>",
    )
    rows = {r["label"]: r for r in quantize_int8_stats(df).collect()}
    r = rows[1]
    # zero vector contributes all-zero quants; real vector max|x|=2 →
    # q = round([63.5, -127, 31.75]+.5) = [64, -127, 32]
    assert r["n_vecs"] == 2
    assert r["min_q"] == -127 and r["max_q"] == 64
    assert r["sum_q"] == 64 - 127 + 32


def test_hll_mergeable_rollup_close_to_exact(spark):
    """Weekly uniques from unioned daily sketches must land within HLL
    error (lgK=12 → ~1.6% rel. std err; assert 5%) of the exact
    countDistinct — and re-aggregation must never touch raw rows."""
    ev = load_table(spark, SF, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = (
        daily.groupBy("event_type", F.date_trunc("week", "day").alias("week"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"))
    )
    exact = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact"))
    joined = weekly.join(exact, ["event_type", "week"]).collect()
    assert joined
    for r in joined:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"])


def test_kll_quantile_accuracy(spark):
    """Weekly p50/p90 from merged daily KLL sketches must land within
    KLL rank error (default k=200 -> ~1.7% rank error; assert a rank
    window of +-4%) of the exact sorted quantile, and the weekly merge
    must operate on day sketches, not raw rows."""
    from kafka_bigdata_jobs_spark import suite

    approx = suite.registry()["weekly_value_quantiles_kll"].fn(spark, SF)
    ev = load_table(spark, SF, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    rows = approx.collect()
    assert rows
    # exact rank of the sketch's answer must be near the target rank
    for r in rows[:10]:  # bounded: each check is one filtered count
        base = ev.where(
            (F.date_trunc("week", F.col("ts").cast("timestamp")) == r["week"])
            & (F.col("event_type") == r["event_type"])
        ).select(cents.alias("c"))
        n = base.count()
        if n < 50:
            continue
        for target, got in ((0.5, r["p50_cents"]), (0.9, r["p90_cents"])):
            rank = base.where(F.col("c") <= got).count() / n
            assert abs(rank - target) <= 0.04, (r["week"], r["event_type"], target, rank)


def test_sketch_accuracy_report_is_self_auditing(spark):
    """The driver-facing accuracy artifact must carry every sketch family
    with an exact twin, and each reported error must sit inside the same
    tolerance the dedicated accuracy tests pin (HLL lgK=12 ~1.6% rse ->
    5%; KLL k=200 ~1.7% rank err -> value within a few % for smooth
    regions; theta exact-mode below k=4096)."""
    from kafka_bigdata_jobs_spark import suite

    rows = (
        suite.registry()["sketch_accuracy_report"].fn(spark, SF).collect()
    )
    by_sketch: dict = {}
    for r in rows:
        by_sketch.setdefault(r["sketch"], []).append(r)
        assert r["err_bp"] == abs(r["estimate"] - r["exact"]) * 10000 // max(
            r["exact"], 1
        )
    assert set(by_sketch) == {
        "hll_distinct_users", "kll_quantile", "theta_intersection",
    }
    assert len(by_sketch["kll_quantile"]) == 3
    for r in by_sketch["hll_distinct_users"]:
        assert r["err_bp"] <= 500, r
    for r in by_sketch["theta_intersection"]:
        assert r["err_bp"] <= 500, r
    for r in by_sketch["kll_quantile"]:
        # p99 of a heavy tail is rank-accurate but value-noisy; the
        # report exists to SHOW that, so the bound is loose there
        limit = 2000 if r["scope"] == "p99_value_cents" else 1000
        assert r["err_bp"] <= limit, r


def test_theta_overlap_accuracy(spark):
    """Theta-sketch intersection estimates must match exact distinct
    intersections (fixture cardinalities are far below the sketch's
    k=4096 exact-mode bound, so estimates are exact here)."""
    from kafka_bigdata_jobs_spark import suite

    got = {
        (r["type_a"], r["type_b"]): r
        for r in suite.registry()["audience_overlap_theta"].fn(spark, SF).collect()
    }
    assert got
    ev = load_table(spark, SF, "events")
    users = ev.select("event_type", "user_id").distinct().collect()
    by_type: dict = {}
    for r in users:
        by_type.setdefault(r["event_type"], set()).add(r["user_id"])
    for (ta, tb), row in got.items():
        inter = len(by_type[ta] & by_type[tb])
        union = len(by_type[ta] | by_type[tb])
        assert abs(row["overlap"] - inter) <= max(2, 0.05 * inter)
        assert abs(row["union_size"] - union) <= max(2, 0.05 * union)
