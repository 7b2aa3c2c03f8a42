"""Rule-based sentiment classifier — the reference's single UDF
(reference ``streaming/job3_sentiment.py:154-243``), re-expressed twice:

1. :func:`with_sentiment` — pure column expressions (the engine's
   source of truth: Catalyst-optimizable, codegen'd, oracle-checkable);
2. :func:`with_sentiment_pandas_udf` — an Arrow-vectorized pandas UDF
   returning the same 4-field struct, demonstrating the engine's UDF
   surface (the reference uses a row-at-a-time Python udf, the slowest
   possible variant — SURVEY.md §2.11).

Semantics preserved from the reference: positive/negative keyword-hit
counts (×1), repeated-``!`` penalty, shouting (caps-ratio) penalty, a
linear score and a 5-way classification ladder.  The emoji counts of
the reference collapse into the keyword mechanism (fixture text has no
emoji; the lexicon lists are the pluggable part).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSITIVE_WORDS: tuple[str, ...] = ("fast", "small", "merge", "value", "spark")
NEGATIVE_WORDS: tuple[str, ...] = ("slow", "big", "scan", "dup", "filter")


def _hits(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def sentiment_score(text: Column) -> Column:
    """Linear score: +1/positive hit, -1/negative hit, -3 repeated '!',
    -2 shouting (majority-uppercase text longer than 10 chars) —
    reference ``streaming/job3_sentiment.py:191-200``."""
    pos = _hits(text, POSITIVE_WORDS)
    neg = _hits(text, NEGATIVE_WORDS)
    bangs = F.when(text.rlike(r"!{2,}"), -3).otherwise(0)
    upper_len = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    shouting = F.when((upper_len * 2 > F.length(text)) & (F.length(text) > 10), -2).otherwise(0)
    return (pos - neg + bangs + shouting).cast("int")


def classify(score: Column) -> Column:
    """5-way ladder (reference ``streaming/job3_sentiment.py:204-230``)."""
    return (
        F.when(score >= 3, "very_positive")
        .when(score >= 1, "positive")
        .when(score <= -3, "very_negative")
        .when(score <= -1, "negative")
        .otherwise("neutral")
    )


def with_sentiment(df: DataFrame, text_col: str) -> DataFrame:
    t = F.col(text_col)
    pos = _hits(t, POSITIVE_WORDS)
    neg = _hits(t, NEGATIVE_WORDS)
    score = sentiment_score(t)
    return (
        df.withColumn("pos_hits", pos)
        .withColumn("neg_hits", neg)
        .withColumn("sentiment_score", score)
        .withColumn("sentiment", classify(score))
    )


_SENTIMENT_STRUCT = T.StructType(
    [
        T.StructField("pos_hits", T.IntegerType()),
        T.StructField("neg_hits", T.IntegerType()),
        T.StructField("sentiment_score", T.IntegerType()),
        T.StructField("sentiment", T.StringType()),
    ]
)


def with_sentiment_pandas_udf(df: DataFrame, text_col: str) -> DataFrame:
    """Same semantics through the Arrow-vectorized UDF surface.

    One batch-level regex pass per lexicon via pandas ``str.count`` —
    ~10-100× faster than the reference's row-at-a-time ``udf`` and the
    template for operators that genuinely need Python (SURVEY §2.11).
    """
    import re

    pos_re = re.compile(r"\b(" + "|".join(POSITIVE_WORDS) + r")\b")
    neg_re = re.compile(r"\b(" + "|".join(NEGATIVE_WORDS) + r")\b")
    bang_re = re.compile(r"!{2,}")

    @F.pandas_udf(_SENTIMENT_STRUCT)
    def _sentiment(texts: pd.Series) -> pd.DataFrame:
        low = texts.fillna("").str.lower()
        pos = low.str.count(pos_re).astype("int32")
        neg = low.str.count(neg_re).astype("int32")
        raw = texts.fillna("")
        bangs = raw.str.contains(bang_re).map({True: -3, False: 0}).astype("int32")
        upper_len = raw.str.count(r"[A-Z]")
        shouting = (
            ((upper_len * 2 > raw.str.len()) & (raw.str.len() > 10))
            .map({True: -2, False: 0})
            .astype("int32")
        )
        score = (pos - neg + bangs + shouting).astype("int32")
        label = pd.cut(
            score,
            bins=[-(2**31), -3, -1, 0, 2, 2**31],
            labels=["very_negative", "negative", "neutral", "positive", "very_positive"],
            right=True,
        ).astype(str)
        return pd.DataFrame(
            {
                "pos_hits": pos,
                "neg_hits": neg,
                "sentiment_score": score,
                "sentiment": label,
            }
        )

    out = df.withColumn("__s", _sentiment(F.col(text_col)))
    return (
        out.withColumn("pos_hits", F.col("__s.pos_hits"))
        .withColumn("neg_hits", F.col("__s.neg_hits"))
        .withColumn("sentiment_score", F.col("__s.sentiment_score"))
        .withColumn("sentiment", F.col("__s.sentiment"))
        .drop("__s")
    )
