"""Kafka source/sink adapters (reference ``streaming/job1_bots.py:127-142``
and the producers).

These build the same logical plan the reference builds — subscribe,
``from_json`` decode, event-time derivation — with two scale fixes:

- ``maxOffsetsPerTrigger`` bounds micro-batch size so a backlogged topic
  can't produce an unbounded first batch;
- one streaming query fans out to all sinks via foreachBatch (see
  ``streaming/runner.py``) instead of the reference's 7 concurrent
  queries each re-reading Kafka (SURVEY.md §2.10 T4).

No Kafka broker exists in the test environment; these functions are
exercised by constructing the identical post-decode lineage from file
streams (``stream_files.py``) — the transforms are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TWEET_SCHEMA


#: Maven coordinate a deployment must add for the two functions below —
#: the ONLY missing piece in this sandbox (no broker, no connector jar,
#: no network; decision recorded in SCALE.md).  Version must match the
#: running Spark/Scala build.
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
) -> dict[str, str]:
    """The exact option map the Kafka source receives — a pure function
    so the spelling of every key/value is pinned by a unit test without
    a broker (an option typo fails silently at runtime: unknown options
    are IGNORED by the source, which is why this is the
    highest-probability user-facing breakage in untested code)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Subscribe to topics; returns the raw key/value binary frame."""
    reader = spark.readStream.format("kafka").options(
        **kafka_reader_options(
            bootstrap_servers, topics, starting_offsets,
            max_offsets_per_trigger,
        )
    )
    return reader.load()


def decode_json_events(
    raw: DataFrame,
    schema: T.StructType = TWEET_SCHEMA,
    ts_col: str = "timestamp",
) -> DataFrame:
    """value bytes → JSON → columns, with the event-time column parsed.

    Reference: ``from_json(col("value").cast("string"), schema)`` then
    ``select("data.*")`` then ``to_timestamp`` —
    ``streaming/job1_bots.py:136-140``.  Malformed records decode to
    nulls (never errors), matching the reference's tolerance.
    """
    decoded = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("data")
    ).select("data.*")
    if ts_col in decoded.columns:
        decoded = decoded.withColumn("event_time", F.to_timestamp(F.col(ts_col)))
    return decoded


def to_kafka_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """The WIRE projection: JSON-serialize all columns into binary
    ``value`` (plus an optional binary ``key`` for partition affinity) —
    exactly the frame the Kafka sink ships and the broker hands back to
    a subscriber.  Factored out of :func:`write_kafka` so the
    serialize→decode round trip is testable in batch without a broker:
    ``decode_json_events(to_kafka_payload(df))`` must reproduce ``df``
    (pinned in tests/test_sources.py)."""
    # value carries the FULL record (the key is routing metadata, not a
    # projection — consumers must not need to re-join it).
    out = [F.to_json(F.struct(*df.columns)).cast("binary").alias("value")]
    if key_col is not None:
        out.insert(0, F.col(key_col).cast("string").cast("binary").alias("key"))
    return df.select(*out)


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """JSON-serialize all columns into ``value`` and stream to a topic —
    the engine-side replacement for the reference's Python producer
    loop (``producers/kafka_producer_bitcoin.py:92-124``)."""
    payload = to_kafka_payload(df, key_col=key_col)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
