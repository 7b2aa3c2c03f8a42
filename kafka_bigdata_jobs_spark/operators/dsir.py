"""Data selection via importance resampling (DSIR) — hashed-n-gram
importance weights for pretraining-corpus selection.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): represent target and raw
corpora as distributions over HASHED n-gram features, score each raw
document by the log importance ratio

    w(doc) = Σ_b c_b(doc) · ln( p_target[b] / p_raw[b] ),

then keep documents whose features look more target-like.  The whole
computation is three relational passes — no model, no Python loop:

1. doc × bucket counts: explode word bigrams, hash each into one of
   ``n_buckets`` feature buckets (the md5-prefix idiom from
   :func:`pipeline.hash_bucket` — identical in any engine), count per
   (doc, bucket).  The only corpus-sized shuffle.
2. bucket marginals: target and raw totals per bucket — ``n_buckets``
   rows, broadcast everywhere after.
3. per-doc weights: join doc-counts to the tiny log-ratio relation on
   the bucket key and sum.

Cross-engine exactness: true log-probs are not hashable across engines
(see bigram_coverage_quality), so per-bucket log ratios are quantized
to integer MICRO-NATS — ``round(1e6 · ln(...))`` — making every doc
weight an exact integer.  Both engines evaluate the same double
``ln``; they can disagree only by ~2 ulp (≈5e-15 absolute here), so a
divergence needs the exact value to sit within 5e-15 of a .5e-6
rounding boundary — and tests/test_dsir.py asserts every fixture
bucket clears the boundary by a wide margin, the same
divergence-safety argument codec_parity_report documents.

At 100 TB: bucket marginals are ``n_buckets`` rows regardless of
corpus size; the doc×bucket relation is ≤ n_buckets rows per doc
(bounded, usually far fewer); the weight join broadcasts the ratio
table.  Selection by a fixed sign/threshold (as here) needs no global
sort; top-k resampling composes with relational.top_k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pipeline import hash_bucket
from .quality import ngrams_zip

#: Fixed-point scale for per-bucket log ratios (micro-nats).
LOG_SCALE = 1_000_000


def doc_bucket_counts(
    df: DataFrame,
    id_col: str,
    words_col: str,
    is_target: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, is_target, bucket, c) — hashed-bigram feature counts per doc.
    Docs with fewer than two words contribute no rows."""
    bg = df.select(
        F.col(id_col).alias("id"),
        is_target.cast("long").alias("is_target"),
        F.explode(ngrams_zip(F.col(words_col), 2)).alias("g"),
    )
    return (
        bg.select("id", "is_target", hash_bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_log_ratios(counts: DataFrame, n_buckets: int = 64) -> DataFrame:
    """(bucket, lr) — integer micro-nat log importance ratio per bucket,
    add-one smoothed:  lr = round(1e6 · ln( (t_b+1)(R+B) / ((r_b+1)(T+B)) ))
    where t/r are target/raw bucket totals and T/R their grand totals
    (raw = ALL docs, so the target corpus is a subset, as in DSIR's
    target-vs-raw formulation)."""
    per_bucket = counts.groupBy("bucket").agg(
        F.sum(F.col("c") * F.col("is_target")).alias("t_b"),
        F.sum("c").alias("r_b"),
    )
    tot = per_bucket.agg(
        F.sum("t_b").alias("t_tot"), F.sum("r_b").alias("r_tot")
    )
    b = F.lit(n_buckets)
    return per_bucket.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.lit(LOG_SCALE)
            * F.log(
                ((F.col("t_b") + 1) * (F.col("r_tot") + b)).cast("double")
                / ((F.col("r_b") + 1) * (F.col("t_tot") + b)).cast("double")
            )
        )
        .cast("long")
        .alias("lr"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    words_col: str,
    is_target: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, weight) — integer micro-nat DSIR importance weight per doc
    with at least one bigram.  weight > 0 ⟺ the doc's hashed-feature
    profile is more target-like than raw-like."""
    counts = doc_bucket_counts(df, id_col, words_col, is_target, n_buckets)
    ratios = bucket_log_ratios(counts, n_buckets)
    return (
        counts.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("lr")).cast("long").alias("weight"))
    )
