"""Emoji mechanism parity (VERDICT r1 item 8).

The reference counts how many *distinct* emoji from each class appear
anywhere in a text (``streaming/job3_sentiment.py:168-170``: ``sum(1
for e in LIST if e in txt)``) and weighs the count x2 in the linear
score (``:191-192``).  Fixture documents carry no emoji, so the driver
oracle never exercises this; these synthetic rows pin the mechanism:

* presence-per-listed-emoji, NOT occurrence counting;
* x2 weight relative to keyword hits;
* expression path == Arrow pandas-UDF path on emoji-bearing text.

Oracle-exempt by design: DuckDB regex/contains parity over astral-plane
codepoints is the risk the VERDICT told us to document, so the pin is a
pytest, not an oracle_sql entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators import sentiment as S

ROWS = [
    # (text, expected_pos_emoji_hits, expected_neg_emoji_hits)
    ("to the moon \U0001F680\U0001F680\U0001F680", 1, 0),  # repeats count once
    ("\U0001F600 nice \U0001F44D day \U0001F389", 3, 0),  # distinct each count
    ("ugh \U0001F621\U0001F62D", 0, 2),
    ("mixed \U0001F60A but \U0001F44E", 1, 1),
    ("plain ascii text, no emoji here", 0, 0),
    ("", 0, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(t,) for t, _, _ in ROWS], "text string"
    )


def test_emoji_hits_distinct_presence(spark):
    df = _df(spark).select(
        "text",
        S.emoji_hits(F.col("text"), S.POSITIVE_EMOJIS).alias("pe"),
        S.emoji_hits(F.col("text"), S.NEGATIVE_EMOJIS).alias("ne"),
    )
    got = {r["text"]: (r["pe"], r["ne"]) for r in df.collect()}
    for text, pe, ne in ROWS:
        assert got[text] == (pe, ne), text


def test_emoji_score_weight_is_2x(spark):
    # Pure-emoji text: score must be 2*pos_e - 2*neg_e with no other terms.
    df = spark.createDataFrame(
        [("\U0001F600\U0001F44D",), ("\U0001F621",)], "text string"
    ).select(S.sentiment_score(F.col("text")).alias("s"))
    assert [r["s"] for r in df.collect()] == [4, -2]


def test_expression_equals_pandas_udf_on_emoji(spark):
    base = _df(spark)
    a = S.with_sentiment(base, "text").orderBy("text").collect()
    b = S.with_sentiment_pandas_udf(base, "text").orderBy("text").collect()
    cols = ["pos_hits", "neg_hits", "sentiment_score", "sentiment"]
    for ra, rb in zip(a, b):
        assert ra["text"] == rb["text"]
        for c in cols:
            assert ra[c] == rb[c], (ra["text"], c, ra[c], rb[c])
