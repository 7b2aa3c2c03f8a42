"""Batch CSV sources for the canonical tweet tables.

The reference reads the headerless bitcoin CSV with ``inferSchema`` and
a positional ``_c{i}`` rename loop (``batch/job1_locations.py:30-37``)
and the ethereum CSV with ``header=True, inferSchema=True``
(``:49-62``).  Declared schemas kill the inference scan (a full extra
pass over 100 TB) and give stable types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BITCOIN_CSV_COLUMNS

#: Declared schema for the 13-column headerless bitcoin CSV.
_BITCOIN_CSV_SCHEMA = T.StructType(
    [
        T.StructField("user_name", T.StringType()),
        T.StructField("user_location", T.StringType()),
        T.StructField("user_description", T.StringType()),
        T.StructField("user_created", T.StringType()),
        T.StructField("user_followers", T.DoubleType()),  # CSV carries "1234.0"
        T.StructField("user_friends", T.DoubleType()),
        T.StructField("user_favourites", T.DoubleType()),
        T.StructField("user_verified", T.BooleanType()),
        T.StructField("date", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("hashtags", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("is_retweet", T.BooleanType()),
    ]
)

#: fillna defaults (reference batch/job1_locations.py:39-43, job4_spam.py:43-47).
FILL_DEFAULTS = {
    "user_location": "Unknown",
    "user_description": "",
    "user_followers": 0,
    "user_friends": 0,
    "user_favourites": 0,
    "text": "",
    "hashtags": "",
    "source": "Unknown",
}


def read_tweets_csv(
    spark: SparkSession,
    path: str,
    crypto_type: str,
    header: bool = False,
) -> DataFrame:
    """Read one tweet CSV, tag it with its ``crypto_type`` discriminator,
    repair nulls, and normalize metric columns to int."""
    df = spark.read.csv(
        path,
        schema=_BITCOIN_CSV_SCHEMA if not header else None,
        header=header,
        multiLine=True,
        escape='"',
    )
    if header:
        df = df.toDF(*BITCOIN_CSV_COLUMNS[: len(df.columns)])
    df = df.na.fill(FILL_DEFAULTS).withColumn("crypto_type", F.lit(crypto_type))
    for c in ("user_followers", "user_friends", "user_favourites"):
        df = df.withColumn(c, F.col(c).cast("long"))
    return df


def read_csv_with_rejects(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read splitting clean rows from quarantined ones.

    At scale a multi-TB load must never die on one malformed line
    (FAILFAST) nor silently null it out (plain PERMISSIVE).  The
    declared schema is extended with ``columnNameOfCorruptRecord``;
    rows that fail to parse keep their raw line there.  Returns
    ``(good, rejects)``: good rows without the capture column, rejects
    as ``(raw_line)`` for the quarantine sink.

    Note Spark requires referencing the corrupt column via a
    materialized plan (it is populated at parse time, and filtering on
    it directly over a pure scan is disallowed) — hence the cache().
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.csv(
        path,
        schema=full_schema,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
        multiLine=True,
        escape='"',
    ).cache()
    good = raw.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = raw.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, rejects


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines read with a declared schema and a quarantine split —
    the JSONL twin of :func:`read_csv_with_rejects` (crawl dumps and
    export feeds arrive as JSONL at least as often as CSV).

    Schema declared, never inferred: inference is an extra full pass
    over the data and types drift run-to-run with the sample.  Returns
    ``(good, rejects)`` exactly like the CSV variant.
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = spark.read.json(
        path,
        schema=full_schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
    ).cache()
    good = raw.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = raw.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, rejects


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan with optional column projection.

    ORC carries its schema (no inference pass) and, like parquet,
    supports predicate pushdown + column pruning — the projection here
    exists so callers state intent early and the pruned ReadSchema is
    visible in the plan even before any downstream select.
    """
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df
