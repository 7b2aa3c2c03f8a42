"""Corpus-quality operators: repetition stats, decontamination, BPE
pairs — edge cases (short docs, repeated text) + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.quality import (
    char_pair_counts,
    contamination_overlap,
    repetition_stats,
    word_bigrams_all,
    word_ngrams_distinct,
)


def test_bigrams_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "solo"), (3, "x y")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r["grams"]
        for r in df.select(
            "doc_id", word_bigrams_all(F.col("text")).alias("grams")
        ).collect()
    }
    assert rows[1] == ["a b", "b a", "a b", "b a"]  # multiplicity preserved
    assert rows[2] == []  # < 2 words -> empty, NOT descending-sequence garbage
    assert rows[3] == ["x y"]


def test_ngrams_distinct_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = df.select(word_ngrams_distinct(F.col("text"), 5).alias("g")).first()["g"]
    assert out == []


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a", "s1"), (2, "u v w x", "s1")], ["doc_id", "text", "source"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(df, "doc_id", "text", carry=["source"]).collect()
    }
    assert out[1]["n_words"] == 5
    assert out[1]["n_distinct_words"] == 2
    assert out[1]["n_bigrams"] == 4
    assert out[1]["top_bigram_count"] == 2  # "a b" x2
    assert out[2]["top_bigram_count"] == 1


def test_contamination_overlap_and_broadcast(spark):
    train = spark.createDataFrame(
        [(1, "q w e r t y u"), (2, "n o p q r s t")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "q w e r t z z")], ["doc_id", "text"])
    hits = contamination_overlap(train, bench, "doc_id", "text", n=5)
    got = {r["doc_id"]: r["shared_grams"] for r in hits.collect()}
    # train doc 1 shares exactly one 5-gram ("q w e r t"); doc 2 none.
    assert got == {1: 1}
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench gram set must broadcast


def test_char_pair_counts(spark):
    df = spark.createDataFrame([(1, "abab ab x")], ["doc_id", "text"])
    got = {r["pair"]: r["cnt"] for r in char_pair_counts(df, "text").collect()}
    # "abab" -> ab, ba, ab ; "ab" -> ab ; "x" dropped (length 1)
    assert got == {"ab": 3, "ba": 1}
