"""Rule-based sentiment classifier — the reference's single UDF
(reference ``streaming/job3_sentiment.py:154-243``), re-expressed twice:

1. :func:`with_sentiment` — pure column expressions (the engine's
   source of truth: Catalyst-optimizable, codegen'd, oracle-checkable);
2. :func:`with_sentiment_pandas_udf` — an Arrow-vectorized pandas UDF
   returning the same 4-field struct, demonstrating the engine's UDF
   surface (the reference uses a row-at-a-time Python udf, the slowest
   possible variant — SURVEY.md §2.11).

Semantics preserved from the reference: positive/negative keyword-hit
counts (×1), emoji *presence* counts (×2 — see below), repeated-``!``
penalty, shouting (caps-ratio) penalty, a linear score and a 5-way
classification ladder.  The lexicon/emoji lists are the pluggable part.

Emoji mechanism parity (reference ``streaming/job3_sentiment.py:56-57``
for the lists, ``:168-170`` for the count, ``:191-192`` for the ×2
weight): the reference counts how many *distinct* emoji from each class
appear anywhere in the text (``sum(1 for e in LIST if e in txt)``) —
presence per listed codepoint, NOT occurrence count.  ``emoji_hits``
reproduces exactly that as a sum of codegen'd ``contains`` predicates;
``sentiment_score`` weighs it ×2 like the reference.  Fixture text has
no emoji so the driver oracle is unaffected; the mechanism is pinned by
``tests/test_sentiment_emoji.py`` on synthetic emoji rows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSITIVE_WORDS: tuple[str, ...] = ("fast", "small", "merge", "value", "spark")
NEGATIVE_WORDS: tuple[str, ...] = ("slow", "big", "scan", "dup", "filter")

# Standard Unicode emoji split into sentiment classes (the reference
# ships similar hand-picked lists at streaming/job3_sentiment.py:56-57;
# lists are pluggable data, the counting mechanism is the parity target).
POSITIVE_EMOJIS: tuple[str, ...] = (
    "\U0001F600", "\U0001F601", "\U0001F602", "\U0001F60A", "\U0001F60D",
    "\U0001F929", "\U0001F609", "\U0001F44D", "\U0001F64C", "\U0001F389",
    "\U0001F4B0", "\U0001F680", "✨",
)
NEGATIVE_EMOJIS: tuple[str, ...] = (
    "\U0001F621", "\U0001F620", "\U0001F624", "\U0001F61E", "\U0001F622",
    "\U0001F62D", "\U0001F4A9", "\U0001F44E", "\U0001F631", "\U0001F628",
)


def _hits(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def emoji_hits(text: Column, emojis: tuple[str, ...]) -> Column:
    """How many *distinct* emoji from ``emojis`` appear in ``text``.

    Presence-per-listed-codepoint, NOT occurrence count — exactly the
    reference's ``sum(1 for e in LIST if e in txt)``
    (``streaming/job3_sentiment.py:168-170``).  A sum of ``contains``
    predicates stays inside whole-stage codegen; no regex needed.
    """
    terms = [F.when(text.contains(e), 1).otherwise(0) for e in emojis]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def sentiment_score(text: Column) -> Column:
    """Linear score: +2/distinct positive emoji, -2/distinct negative
    emoji, +1/positive keyword hit, -1/negative hit, -3 repeated '!',
    -2 shouting (majority-uppercase text longer than 10 chars) —
    reference ``streaming/job3_sentiment.py:188-201``."""
    pos = _hits(text, POSITIVE_WORDS)
    neg = _hits(text, NEGATIVE_WORDS)
    pos_e = emoji_hits(text, POSITIVE_EMOJIS)
    neg_e = emoji_hits(text, NEGATIVE_EMOJIS)
    bangs = F.when(text.rlike(r"!{2,}"), -3).otherwise(0)
    upper_len = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    shouting = F.when((upper_len * 2 > F.length(text)) & (F.length(text) > 10), -2).otherwise(0)
    return (pos - neg + 2 * pos_e - 2 * neg_e + bangs + shouting).cast("int")


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
        # Distinct-presence emoji counts, same semantics as emoji_hits().
        pos_e = sum(
            raw.str.contains(e, regex=False).astype("int32") for e in POSITIVE_EMOJIS
        )
        neg_e = sum(
            raw.str.contains(e, regex=False).astype("int32") for e in NEGATIVE_EMOJIS
        )
        bangs = raw.str.contains(bang_re).map({True: -3, False: 0}).astype("int32")
        upper_len = raw.str.count(r"[A-Z]")
        shouting = (
            ((upper_len * 2 > raw.str.len()) & (raw.str.len() > 10))
            .map({True: -2, False: 0})
            .astype("int32")
        )
        score = (pos - neg + 2 * pos_e - 2 * neg_e + bangs + shouting).astype("int32")
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
