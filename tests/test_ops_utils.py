"""Operational utilities: compaction, GDPR deletion, schema evolution."""

from __future__ import annotations

import pathlib
import tempfile

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.schemas import load_table
from kafka_bigdata_jobs_spark.sinks import compact_parquet_dir, delete_keys_rewrite

SF = "/root/testdata/sf0.001"


def _parquet_files(path):
    return [p for p in pathlib.Path(path).rglob("*.parquet")]


def test_compact_merges_small_files(spark):
    d = tempfile.mkdtemp(prefix="compact_")
    ev = load_table(spark, SF, "events")
    ev.repartition(16).write.mode("overwrite").parquet(d)
    before = ev.count()
    assert len(_parquet_files(d)) == 16
    n_out = compact_parquet_dir(spark, d, target_file_bytes=1 << 30)
    assert n_out == 1
    assert len(_parquet_files(d)) == 1
    after = spark.read.parquet(d)
    assert after.count() == before
    assert set(after.columns) == set(ev.columns)


def test_compact_sorted_footers_disjoint(spark):
    d = tempfile.mkdtemp(prefix="compact_sorted_")
    ev = load_table(spark, SF, "events")
    ev.repartition(8).write.mode("overwrite").parquet(d)
    compact_parquet_dir(spark, d, target_file_bytes=1, sort_within_by=["user_id"])
    # >1 output file, each internally sorted on user_id.
    files = _parquet_files(d)
    assert len(files) > 1
    import pyarrow.parquet as pq

    for f in files:
        col = pq.read_table(f, columns=["user_id"])["user_id"].to_pylist()
        assert col == sorted(col)


def test_delete_keys_rewrite(spark):
    d = tempfile.mkdtemp(prefix="erase_")
    ev = load_table(spark, SF, "events")
    ev.write.mode("overwrite").parquet(d)
    total = ev.count()
    victims = ev.select("user_id").distinct().limit(3)
    victim_rows = ev.join(victims, "user_id").count()
    survivors = delete_keys_rewrite(spark, d, victims, "user_id")
    assert survivors == total - victim_rows
    re = spark.read.parquet(d)
    assert re.join(victims, "user_id").count() == 0


def test_schema_evolution_merge(spark):
    """mergeSchema read across files written with evolving schemas: old
    files surface the new column as NULL, nothing errors."""
    d = tempfile.mkdtemp(prefix="evolve_")
    spark.createDataFrame([(1, "a")], "id int, s string").write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id int, s string, score double"
    ).write.mode("append").parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5
