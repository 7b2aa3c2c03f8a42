"""End-to-end tweet pipeline: JSON file stream (Kafka stand-in) →
decode → reference-job transforms → multi-sink, asserted against the
identical transforms run in batch (the engine's duality contract)."""

from __future__ import annotations

import datetime as dt
import json
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.schemas import TWEET_SCHEMA
from kafka_bigdata_jobs_spark.sources.stream_files import read_json_stream
from kafka_bigdata_jobs_spark.streaming import jobs
from kafka_bigdata_jobs_spark.streaming.runner import MemorySink, run_multi_sink

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _tweet(i: int) -> dict:
    crypto = "bitcoin" if i % 3 else "ethereum"
    ts = (T0 + dt.timedelta(seconds=20 * i)).isoformat()
    return {
        "crypto_type": crypto,
        "user_name": f"user{i % 17}",
        "user_location": ["Lima, Peru", "Madrid", "Worldwide", ""][i % 4],
        "user_description": "trader" if i % 2 else "",
        "user_created": "2020-06-01",
        "user_followers": (i * 131) % 200_000,
        "user_friends": (i * 17) % 2_000,
        "user_favourites": (i * 7) % 5_000,
        "user_verified": i % 11 == 0,
        "date": ts,
        "text": f"market update {i} " + ("PUMP giveaway!!" if i % 13 == 0 else "steady"),
        "hashtags": "['btc', 'crypto']" if crypto == "bitcoin" else "['eth']",
        "source": ["Twitter Web App", "Twitter for iPhone", "bot-api"][i % 3],
        "is_retweet": i % 5 == 0,
        "timestamp": ts,
    }


@pytest.fixture(scope="module")
def tweet_stream_dir(spark):
    import time

    d = tempfile.mkdtemp(prefix="tweets_json_")
    rows = [_tweet(i) for i in range(240)]
    # two time-ordered files → two micro-batches
    for half, chunk in enumerate([rows[:120], rows[120:]]):
        with open(f"{d}/part-{half}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in chunk))
        time.sleep(1.1)
    return d


def _decoded_batch(spark, tweet_stream_dir):
    df = spark.read.schema(TWEET_SCHEMA).json(tweet_stream_dir)
    return df.withColumn("event_time", F.to_timestamp("timestamp"))


def _decoded_stream(spark, tweet_stream_dir):
    df = read_json_stream(spark, tweet_stream_dir, TWEET_SCHEMA)
    return df.withColumn("event_time", F.to_timestamp("timestamp"))


def test_trending_hashtags_stream_vs_batch(spark, tweet_stream_dir):
    batch_counts = {
        (r["window_start"], r["crypto_type"], r["hashtag"]): r["tag_count"]
        for r in jobs.trending_hashtags(
            _decoded_batch(spark, tweet_stream_dir), top_n=1000
        ).collect()
    }
    sink = MemorySink()
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_multi_sink(
            jobs.trending_hashtags(_decoded_stream(spark, tweet_stream_dir)),
            [sink],
            checkpoint=ckpt,
        )
        q.awaitTermination(180)
    assert sink.rows, "stream emitted no trending windows"
    for r in sink.rows:
        k = (r["window_start"], r["crypto_type"], r["hashtag"])
        assert batch_counts[k] == r["tag_count"], k
    assert {r["hashtag"] for r in sink.rows} <= {"btc", "crypto", "eth"}


def test_alert_pipeline_stream(spark, tweet_stream_dir):
    batch_alerts = jobs.engagement_alerts(_decoded_batch(spark, tweet_stream_dir))
    expected = batch_alerts.count()
    by_priority = {
        r["alert_priority"]: r["n"]
        for r in batch_alerts.groupBy("alert_priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sink = MemorySink()
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_multi_sink(
            jobs.engagement_alerts(_decoded_stream(spark, tweet_stream_dir)),
            [sink],
            checkpoint=ckpt,
        )
        q.awaitTermination(180)
    # stateless transform: stream must emit exactly the batch rows
    assert len(sink.rows) == expected > 0
    got = {}
    for r in sink.rows:
        got[r["alert_priority"]] = got.get(r["alert_priority"], 0) + 1
    assert got == by_priority
    assert "P4_suspicious_language" in got


# -- property-based spot checks (SURVEY §5.4) --------------------------------


def test_union_count_additivity(spark, tweet_stream_dir):
    df = _decoded_batch(spark, tweet_stream_dir)
    btc = df.where(F.col("crypto_type") == "bitcoin")
    eth = df.where(F.col("crypto_type") == "ethereum")
    assert btc.count() + eth.count() == df.count()


def test_pivot_row_sums_equal_group_counts(spark):
    from kafka_bigdata_jobs_spark.operators.relational import pivot_counts
    from kafka_bigdata_jobs_spark.schemas import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    piv = pivot_counts(o, ["o_orderpriority"], "o_orderstatus", ["F", "O", "P"])
    plain = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in piv.collect():
        assert r["F"] + r["O"] + r["P"] == plain[r["o_orderpriority"]]


def test_sentiment_partition_of_input(spark, tweet_stream_dir):
    from kafka_bigdata_jobs_spark.operators.sentiment import with_sentiment

    df = _decoded_batch(spark, tweet_stream_dir)
    scored = with_sentiment(df, "text")
    assert scored.count() == df.count()
    classes = {r["sentiment"] for r in scored.select("sentiment").distinct().collect()}
    assert classes <= {
        "very_positive", "positive", "neutral", "negative", "very_negative",
    }


def test_high_frequency_bots_stream_vs_batch(spark, tweet_stream_dir):
    import json as _json
    import datetime as _dt

    # dense burst fixture: one user fires 5 tweets in 40 s, twice, plus
    # quiet users — only the burst windows must surface
    d = tempfile.mkdtemp(prefix="tweets_burst_")
    rows = []
    for burst, start in enumerate([T0, T0 + _dt.timedelta(minutes=10)]):
        for i in range(5):
            t = _tweet(i)
            t["user_name"] = "burster"
            t["timestamp"] = t["date"] = (start + _dt.timedelta(seconds=8 * i)).isoformat()
            t["crypto_type"] = "bitcoin"
            rows.append(t)
    for i in range(20):  # quiet background, one tweet per 5 min each
        t = _tweet(100 + i)
        t["timestamp"] = t["date"] = (T0 + _dt.timedelta(minutes=5 * i)).isoformat()
        rows.append(t)
    with open(f"{d}/part-0.json", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))

    batch = {tuple(r) for r in jobs.high_frequency_bots(_decoded_batch(spark, d)).collect()}
    assert batch, "burst fixture produced no high-frequency windows"
    assert all(r[2] == "burster" for r in batch)

    sink = MemorySink(limit_per_batch=1_000_000)
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_multi_sink(
            jobs.high_frequency_bots(_decoded_stream(spark, d)),
            [sink],
            checkpoint=ckpt,
        )
        q.awaitTermination(180)
    got = {tuple(r) for r in sink.rows}
    # append mode: windows still open at end-of-stream are not emitted,
    # so the stream output is a subset of batch; the first burst (well
    # before the final watermark) must have surfaced.
    assert got <= batch
    assert any(r[0].hour == 9 and r[0].minute == 0 for r in got), (
        "closed first-burst window missing"
    )


def test_location_metrics_stream_vs_batch(spark, tweet_stream_dir):
    batch = {
        tuple(r)
        for r in jobs.location_metrics(
            _decoded_batch(spark, tweet_stream_dir)
        ).collect()
    }
    sink = MemorySink(limit_per_batch=1_000_000)
    with tempfile.TemporaryDirectory() as ckpt:
        q = run_multi_sink(
            jobs.location_metrics(_decoded_stream(spark, tweet_stream_dir)),
            [sink],
            checkpoint=ckpt,
        )
        q.awaitTermination(180)
    got = {tuple(r) for r in sink.rows}
    # stream ⊆ batch (append mode holds back still-open windows); every
    # emitted row matches batch exactly — approx_count_distinct's HLL
    # merge is order-independent, so the counts agree bit-for-bit.
    assert got and got <= batch
    assert any(r["location"] != "Unknown" for r in sink.rows)
    # windows that closed ≥ watermark horizon before the last event all arrived
    import datetime as _dt
    last = max(r[1] for r in batch)
    closed = {r for r in batch if r[1] <= last - _dt.timedelta(minutes=8)}
    assert closed <= got
