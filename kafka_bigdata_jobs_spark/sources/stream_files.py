"""File-based stream source — the test-mode stand-in for Kafka.

``trigger(availableNow=True)`` + a file stream gives deterministic,
replayable micro-batches, which is how the streaming suite asserts
stream ≡ batch on the same data (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream a directory of parquet files (schema must be declared —
    streams cannot infer)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_json_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream newline-JSON files — same decode semantics as the Kafka
    value payload (malformed → nulls)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source (timestamp, value) — load-generator stand-in
    for the reference's rate-limited producer replay
    (``producers/kafka_producer_bitcoin.py:105-114``)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
