"""Python DataSource (Spark 4) tweet-replay source: batch determinism,
partition parallelism, stream/batch replay equivalence, and feeding a
real job transform (the reference's producers → Kafka → job path with
no broker; producers/kafka_producer_bitcoin.py:92-124 replay semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.schemas import TWEET_SCHEMA
from kafka_bigdata_jobs_spark.sources.pydatasource import register_tweet_replay


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_tweet_replay(spark)


def _batch(spark, rows=400, parts=4, seed=42):
    return (
        spark.read.format("tweet_replay")
        .option("rows", rows)
        .option("numPartitions", parts)
        .option("seed", seed)
        .load()
    )


def test_batch_schema_and_determinism(spark):
    df = _batch(spark)
    assert df.schema == TWEET_SCHEMA
    a = df.orderBy("timestamp").collect()
    b = _batch(spark).orderBy("timestamp").collect()
    assert a == b
    assert len(a) == 400
    # different seed → different corpus
    c = _batch(spark, seed=7).orderBy("timestamp").collect()
    assert a != c


def test_batch_partition_parallelism(spark):
    df = _batch(spark, rows=1000, parts=8)
    assert df.rdd.getNumPartitions() == 8
    # partitions tile the id range exactly: no dupes, no gaps
    assert df.count() == 1000
    assert df.select("timestamp").distinct().count() == 1000


def test_stream_replay_equals_batch_prefix(spark):
    stream = (
        spark.readStream.format("tweet_replay")
        .option("rowsPerBatch", 100)
        .option("maxRows", 300)
        .option("seed", 42)
        .load()
    )
    # Python SimpleDataSourceStreamReader doesn't support availableNow;
    # drain with default micro-batches until the offset stops advancing.
    q = (
        stream.writeStream.format("memory")
        .queryName("tweet_replay_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("tweet_replay_mem").orderBy("timestamp").collect()
    want = _batch(spark, rows=300).orderBy("timestamp").collect()
    assert got == want


def test_feeds_job_transform(spark):
    """The generated corpus drives the trending-hashtags transform."""
    from kafka_bigdata_jobs_spark.operators.text import extract_hashtags

    df = _batch(spark, rows=500)
    tags = extract_hashtags(df, "hashtags")
    counts = tags.groupBy("hashtag").count().collect()
    assert counts and all(r["hashtag"] and not r["hashtag"].startswith("[") for r in counts)


def test_archive_writer_batch_manifest(spark, tmp_path):
    """Batch face of the jsonl_archive sink: every task stages a temp
    file, commit publishes a manifest, and the committed view equals
    the input exactly (no orphan .tmp leakage into the manifest)."""
    import json
    import os

    from kafka_bigdata_jobs_spark.sources.pydatasource import read_archive_manifests

    d = str(tmp_path / "archive")
    df = _batch(spark, rows=300, parts=3)
    df.write.format("jsonl_archive").option("path", d).mode("append").save()

    files, rows = read_archive_manifests(d)
    assert rows == 300
    assert files and all(f.startswith("part-") for f in files)
    # committed files exist and contain exactly the committed rows
    on_disk = sum(
        1 for f in files for _ in open(os.path.join(d, f))
    )
    assert on_disk == 300
    # rows are real JSON with the canonical columns
    first = json.loads(open(os.path.join(d, files[0])).readline())
    assert {"crypto_type", "user_name", "text"} <= set(first)
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]


def test_archive_writer_stream_exactly_once(spark, tmp_path):
    """Streaming face: one manifest per micro-batch keyed by batchId;
    rerunning the same bounded stream from the SAME checkpoint adds
    nothing (replayed batches republish idempotently), so the
    committed row count equals the source corpus exactly once."""
    from kafka_bigdata_jobs_spark.sources.pydatasource import read_archive_manifests

    d = str(tmp_path / "stream_archive")
    ck = str(tmp_path / "ck")

    def run():
        # SimpleDataSourceStreamReader doesn't support availableNow;
        # drain with default micro-batches until offsets stop advancing.
        q = (
            spark.readStream.format("tweet_replay")
            .option("rowsPerBatch", 50)
            .option("maxRows", 200)
            .load()
            .writeStream.format("jsonl_archive")
            .option("path", d)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    files1, rows1 = read_archive_manifests(d)
    assert rows1 == 200
    assert len(files1) >= 4  # one file per micro-batch minimum

    run()  # restart from the same checkpoint: source is exhausted
    files2, rows2 = read_archive_manifests(d)
    assert rows2 == 200
    assert files2 == files1


def test_archive_gc_removes_orphans_keeps_committed(spark, tmp_path):
    """GC deletes aged orphan temps and unreferenced parts, never
    committed files or fresh in-flight temps."""
    import os
    import time

    from kafka_bigdata_jobs_spark.sources.pydatasource import (
        JsonlArchiveDataSource,
        gc_archive,
        read_archive_manifests,
    )

    spark.dataSource.register(JsonlArchiveDataSource)
    d = str(tmp_path / "arch")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.format(
        "jsonl_archive"
    ).option("path", d).mode("append").save()
    committed, rows = read_archive_manifests(d)
    assert rows == 2 and committed

    old = time.time() - 7200
    orphan_tmp = os.path.join(d, ".part-deadbeef.jsonl.tmp")
    unref_part = os.path.join(d, "part-cafebabe.jsonl")
    fresh_tmp = os.path.join(d, ".part-freshfresh.jsonl.tmp")
    for p in (orphan_tmp, unref_part, fresh_tmp):
        with open(p, "w") as f:
            f.write("{}\n")
    os.utime(orphan_tmp, (old, old))
    os.utime(unref_part, (old, old))

    n_tmp, n_unref = gc_archive(d, min_age_s=3600)
    assert (n_tmp, n_unref) == (1, 1)
    assert not os.path.exists(orphan_tmp)
    assert not os.path.exists(unref_part)
    assert os.path.exists(fresh_tmp)  # too young — in-flight, kept
    for name in committed:
        assert os.path.exists(os.path.join(d, name))
    assert read_archive_manifests(d) == (committed, rows)
