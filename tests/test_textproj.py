"""Shared tokenized projection (textproj) invariants.

The text-quality group (quality_histogram, repetition_quality_flags,
vocab_coverage_stats, vocabulary_drift_flags, train_contamination_5gram)
derives from ONE cached split of ``documents`` instead of re-splitting
per query (round-1 VERDICT item 7).  These tests pin:

* cache identity — two calls for the same (session, sf_dir) return the
  same plan, and the relation is actually cached;
* ``guarded_word_count`` reproduces ``textstats.word_count``'s
  empty-text special case exactly, row for row, on real fixture data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators import textproj
from kafka_bigdata_jobs_spark.operators.textstats import word_count
from kafka_bigdata_jobs_spark.schemas import load_table


def test_cache_identity_and_reuse(spark, sf_dir):
    a = textproj.tokenized_documents(spark, sf_dir)
    b = textproj.tokenized_documents(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory  # .cache() applied
    assert {"doc_id", "source", "lang", "n_chars", "n_alpha", "words"} <= set(
        a.columns
    )


def test_guarded_word_count_matches_word_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        word_count(F.col("text")).alias("direct"),
        textproj.guarded_word_count(F.split(F.trim("text"), r"\s+")).alias(
            "via_words"
        ),
    )
    # Include the empty/whitespace edge cases synthetically too.
    edge = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("  two words ",)], "text string"
    ).select(
        word_count(F.col("text")).alias("direct"),
        textproj.guarded_word_count(F.split(F.trim("text"), r"\s+")).alias(
            "via_words"
        ),
    )
    for df in (both, edge):
        assert df.where(F.col("direct") != F.col("via_words")).count() == 0
