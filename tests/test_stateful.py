"""Stateful sessionization: stream (applyInPandasWithState) must equal
batch (session_window) on the same data — the engine's golden-output
pattern for custom state."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.schemas import load_table
from kafka_bigdata_jobs_spark.sources.stream_files import read_parquet_stream
from kafka_bigdata_jobs_spark.streaming.runner import MemorySink, run_multi_sink
from kafka_bigdata_jobs_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"
GAP = "10 minutes"


@pytest.fixture(scope="module")
def small_events(spark):
    # A subset small enough to eyeball: 3 users, preserves real gaps.
    return (
        load_table(spark, SF, "events")
        .where(F.col("user_id") < 3)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .cache()
    )


def _key(r):
    return (r["user_id"], r["session_start"], r["session_end"])


def test_batch_sessionization_sane(spark, small_events):
    sessions = sessionize_batch(small_events, gap=GAP).collect()
    assert sessions
    total = sum(s["n_events"] for s in sessions)
    assert total == small_events.count()
    for s in sessions:
        assert s["session_start"] <= s["session_end"]


def test_stream_sessions_match_batch(spark, small_events):
    import time

    batch = {
        _key(r): (r["n_events"], r["total_value_cents"])
        for r in sessionize_batch(small_events, gap=GAP).collect()
    }

    d = tempfile.mkdtemp(prefix="sessions_")
    ev = small_events.orderBy("ts")
    bounds = ev.selectExpr(
        "percentile(cast(cast(ts as timestamp) as double), array(0.5)) as q"
    ).first()["q"]
    ev.where(F.col("ts").cast("timestamp").cast("double") < bounds[0]).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    time.sleep(1.1)
    ev.where(F.col("ts").cast("timestamp").cast("double") >= bounds[0]).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    from tests.test_streaming import EVENTS_SCHEMA
    import pyspark.sql.types as T

    schema = T.StructType([f for f in EVENTS_SCHEMA if f.name != "props"])
    stream = read_parquet_stream(spark, d, schema)
    sessions = sessionize_stream(stream, gap=GAP)
    sink = MemorySink()
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_multi_sink(sessions, [sink], checkpoint=ckpt)
        q.awaitTermination(180)

    got = {_key(r): (r["n_events"], r["total_value_cents"]) for r in sink.rows}
    assert got, "stream emitted no sessions"
    # Every emitted (closed) session must match the batch session exactly;
    # sessions still open at end-of-stream are never emitted in append mode.
    for k, v in got.items():
        assert batch[k] == v, f"session {k}: stream={v} batch={batch[k]}"
    assert len(got) >= len(batch) - 3  # ≤ one open session per user withheld


def test_transform_with_state_dependency_status(capsys):
    """Skip-rot guard (VERDICT r1 item 9): the duality test below skips
    ONLY on missing google.protobuf.  This test always runs: it pins
    that the operator itself imports/constructs fine, and prints the
    skip reason loudly so the conditional skip can't silently rot.  If
    protobuf ever lands in the env, the duality test auto-unskips."""
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False
    from kafka_bigdata_jobs_spark.streaming.stateful import running_user_totals

    assert callable(running_user_totals)
    if not has_protobuf:
        print(
            "SKIP-REASON: transformWithStateInPandas duality test skipped — "
            "google.protobuf absent in this container (pip install "
            "forbidden); operator exercised wherever protobuf exists"
        )


def test_transform_with_state_running_totals(spark, small_events):
    """transformWithStateInPandas running totals: the last Update emitted
    per key must equal the batch groupBy totals (exact cents)."""
    import tempfile as _tf

    # Spark's transformWithState Python protocol needs protobuf, which
    # this container lacks; the operator is exercised wherever it exists.
    pytest.importorskip("google.protobuf")

    from kafka_bigdata_jobs_spark.streaming.stateful import running_user_totals

    batch = {
        r["user_id"]: (r["n"], r["cents"])
        for r in small_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }

    src = _tf.mkdtemp(prefix="twstate_src_")
    # two files → at least two micro-batches → updates actually update
    even = small_events.where(F.col("event_id") % 2 == 0)
    odd = small_events.where(F.col("event_id") % 2 == 1)
    even.coalesce(1).write.mode("overwrite").parquet(src + "/a")
    odd.coalesce(1).write.mode("append").parquet(src + "/a")

    stream = read_parquet_stream(
        spark, src + "/a", small_events.schema, max_files_per_trigger=1
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals_mem")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    updates = spark.table("running_totals_mem").collect()
    assert updates
    # cum_events is monotone per key — the final state is the max row
    last = {}
    for r in updates:
        cur = last.get(r["user_id"])
        if cur is None or r["cum_events"] > cur[0]:
            last[r["user_id"]] = (r["cum_events"], r["cum_cents"])
    assert last == batch
