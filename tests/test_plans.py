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
