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


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Subscribe to topics; returns the raw key/value binary frame."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
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


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str
):
    """JSON-serialize all columns into ``value`` and stream to a topic —
    the engine-side replacement for the reference's Python producer
    loop (``producers/kafka_producer_bitcoin.py:92-124``)."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
