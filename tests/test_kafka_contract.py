"""Kafka wire-contract tests — everything provable WITHOUT a broker.

The sandbox has no broker, no spark-sql-kafka connector jar (0 of the
287 bundled jars), no kafka-python, and no network to fetch any of
them, so the live leg is structurally untestable here (decision
recorded in SCALE.md).  What a broker would NOT change is pinned
below:

1. the reader's option map — Kafka source options are silently IGNORED
   when misspelled, so the exact keys/values are asserted as data;
2. the producer wire projection → consumer decode ROUND TRIP: the
   bytes ``write_kafka`` ships are exactly what ``decode_json_events``
   reconstructs the record from (the broker only moves bytes);
3. the documented failure mode when the connector jar is absent, so a
   user hits a named requirement (KAFKA_PACKAGE), not a mystery.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.sources.kafka import (
    KAFKA_PACKAGE,
    decode_json_events,
    kafka_reader_options,
    to_kafka_payload,
)


def test_reader_option_map_exact():
    assert kafka_reader_options("b1:9092,b2:9092", "tweets") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "tweets",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "100000",
    }
    # earliest replay, unbounded batches
    opts = kafka_reader_options("k:9092", "a,b", "earliest", None)
    assert opts["startingOffsets"] == "earliest"
    assert opts["subscribe"] == "a,b"
    assert "maxOffsetsPerTrigger" not in opts


def test_producer_consumer_round_trip(spark):
    """to_kafka_payload → (broker moves bytes) → decode_json_events
    reproduces the records, including event-time derivation — the
    serialization-compatibility half of the missing live smoke test."""
    rows = [
        (1, "ana", 3.5, True, datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "bob", -0.25, False, datetime.datetime(2024, 1, 2, 3, 5, 0)),
        (3, None, None, None, None),  # null tolerance survives the wire
    ]
    df = spark.createDataFrame(
        rows, "id long, user string, score double, ok boolean, timestamp timestamp")
    wire = to_kafka_payload(df, key_col="user")
    assert wire.columns == ["key", "value"]
    assert dict(wire.dtypes) == {"key": "binary", "value": "binary"}
    schema = df.schema
    back = decode_json_events(wire.select("value"), schema=schema)
    assert back.columns == list(df.columns) + ["event_time"]
    got = sorted(
        (r["id"], r["user"], r["score"], r["ok"], r["timestamp"], r["event_time"])
        for r in back.collect())
    want = sorted((i, u, s, o, t, t) for (i, u, s, o, t) in rows)
    assert got == want


def test_tweet_schema_round_trip(spark):
    """Same round trip over the reference's TWEET_SCHEMA shape."""
    from kafka_bigdata_jobs_spark.schemas import TWEET_SCHEMA

    row = {f.name: None for f in TWEET_SCHEMA.fields}
    row.update(user_name="ana", text="hello #spark", user_followers=10,
               user_verified=True, timestamp="2021-02-05 10:52:04")
    df = spark.createDataFrame(
        [tuple(row[f.name] for f in TWEET_SCHEMA.fields)], TWEET_SCHEMA)
    back = decode_json_events(to_kafka_payload(df))
    r = back.collect()[0]
    assert r["user_name"] == "ana"
    assert r["text"] == "hello #spark"
    assert r["user_followers"] == 10
    assert r["event_time"] == datetime.datetime(2021, 2, 5, 10, 52, 4)


def test_missing_connector_fails_with_named_source(spark):
    """Without the connector jar the source fails by NAME at plan time —
    the error a user must map to KAFKA_PACKAGE.  (Skips if a jar is
    ever added to the image; the live smoke test replaces this then.)"""
    jars = spark.sparkContext._jsc.sc().listJars().mkString(",")
    if "spark-sql-kafka" in jars:
        pytest.skip("connector jar present — run the live smoke test instead")
    from kafka_bigdata_jobs_spark.sources.kafka import read_kafka_stream

    with pytest.raises(Exception, match="(?i)kafka"):
        read_kafka_stream(spark, "localhost:9092", "tweets")
    assert KAFKA_PACKAGE.startswith("org.apache.spark:spark-sql-kafka-0-10")


def test_key_is_routing_metadata_not_projection(spark):
    """The value payload must carry the FULL record even when a key
    column is extracted — consumers must not need to re-join the key."""
    df = spark.createDataFrame([(7, "x")], "id long, user string")
    wire = to_kafka_payload(df, key_col="id")
    r = wire.collect()[0]
    assert bytes(r["key"]) == b"7"
    assert b'"id":7' in bytes(r["value"]) and b'"user":"x"' in bytes(r["value"])
    # no key requested -> value-only frame
    assert to_kafka_payload(df).columns == ["value"]
