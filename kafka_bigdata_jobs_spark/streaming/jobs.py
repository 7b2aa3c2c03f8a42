"""The five reference streaming jobs, re-expressed as mode-agnostic
transforms over the canonical tweet schema.

Every function here is ``DataFrame -> DataFrame`` and runs identically
on a batch frame or a decoded stream (the reference maintains separate
batch/ and streaming/ implementations of the same analytics —
SURVEY.md §1.3 calls out the duplication; this module is the single
implementation).  Event time is the parsed ``event_time`` column
produced by ``sources.kafka.decode_json_events``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.cleaning import clean_locations
from ..operators.relational import count_if, top_k_per_group
from ..operators.sentiment import with_sentiment
from ..operators.text import extract_hashtags
from .windows import high_frequency_keys, windowed_agg

EVENT_TIME = "event_time"


# -- job1: bot detection (reference streaming/job1_bots.py:144-260) ---------


def bot_profile_alerts(tweets: DataFrame, as_of: Column | None = None) -> DataFrame:
    """Profile-based bot signals: brand-new account posting heavily,
    default-ish profile with outsized activity, follower/friend
    imbalance.  Reference rules at ``streaming/job1_bots.py:216-260``
    (account age via datediff, empty-description + thresholds, ratio
    checks); thresholds kept in one place here."""
    age_ref = as_of if as_of is not None else F.current_date()
    account_age = F.datediff(age_ref, F.to_date("user_created"))
    desc_len = F.length(F.coalesce(F.col("user_description"), F.lit("")))
    alerts = (
        F.when((account_age < 30) & (F.col("user_favourites") > 1000), "new_account_heavy_activity")
        .when((desc_len == 0) & (F.col("user_friends") > 1000), "default_profile_mass_follow")
        .when(
            (F.col("user_friends") > 0)
            & (F.col("user_followers") / F.col("user_friends") < 0.01)
            & (F.col("user_friends") > 500),
            "follower_imbalance",
        )
    )
    return (
        tweets.withColumn("alert_reason", alerts)
        .where(F.col("alert_reason").isNotNull())
        .select(
            "crypto_type", "user_name", "alert_reason",
            "user_followers", "user_friends", EVENT_TIME,
        )
    )


def high_frequency_bots(tweets: DataFrame) -> DataFrame:
    """≥3 tweets by one user in a 60 s tumbling window
    (reference ``streaming/job1_bots.py:146-158``)."""
    return high_frequency_keys(
        tweets, EVENT_TIME, ["user_name", "crypto_type"],
        window_duration="60 seconds", min_count=3,
    )


# -- job2: trending hashtags (reference streaming/job2.py:144-199) ----------


def trending_hashtags(tweets: DataFrame, top_n: int = 10) -> DataFrame:
    """Hashtag counts per 5m/1m sliding window × crypto, with per-window
    top-k by ranking window — the engine's distributed replacement for
    the reference's driver-side loop (``streaming/job2.py:215-227``).

    On a stream the rank step requires the windowed agg to complete, so
    ``top_n`` ranking applies in batch mode / foreachBatch; the raw
    windowed counts stream in append mode.
    """
    tags = extract_hashtags(tweets, "hashtags", out_col="hashtag")
    counts = windowed_agg(
        tags, EVENT_TIME, "5 minutes",
        [F.count(F.lit(1)).alias("tag_count")],
        slide="1 minute", keys=["crypto_type", "hashtag"],
    )
    if counts.isStreaming:
        return counts
    return top_k_per_group(
        counts,
        ["window_start", "crypto_type"],
        [F.desc("tag_count"), F.col("hashtag")],
        top_n,
    )


# -- job3: sentiment (reference streaming/job3_sentiment.py) ----------------


def sentiment_metrics(tweets: DataFrame) -> DataFrame:
    """Sentiment classification + 5m/1m windowed class metrics
    (reference ``streaming/job3_sentiment.py:319-328``)."""
    scored = with_sentiment(tweets, "text")
    return windowed_agg(
        scored, EVENT_TIME, "5 minutes",
        [
            F.count(F.lit(1)).alias("n_tweets"),
            F.sum("sentiment_score").alias("score_sum"),
            count_if(F.col("sentiment").startswith("very")).alias("n_extreme"),
        ],
        slide="1 minute", keys=["crypto_type", "sentiment"],
    )


# -- job4: locations (reference streaming/job4_locationsreal_time.py) -------


def location_metrics(tweets: DataFrame) -> DataFrame:
    """Cleaned-location activity per 5m/1m window
    (reference ``streaming/job4_locationsreal_time.py:183-205``)."""
    located = clean_locations(tweets, "user_location", out_col="location")
    return windowed_agg(
        located, EVENT_TIME, "5 minutes",
        [
            F.count(F.lit(1)).alias("n_tweets"),
            F.approx_count_distinct("user_name").alias("approx_users"),
        ],
        slide="1 minute", keys=["crypto_type", "location"],
    )


# -- job5: alerts (reference streaming/job5.py:140-180) ---------------------


def engagement_alerts(tweets: DataFrame) -> DataFrame:
    """Priority-ladder alerts: viral author / VIP / suspicious burst
    (reference CASE ladder ``streaming/job5.py:143-180``), one frame
    with ``alert_priority`` — downstream unions by name with the bot
    alerts (``streaming/job1_bots.py:358-360``)."""
    priority = (
        F.when(F.col("user_verified") & (F.col("user_followers") > 100_000), "P1_vip")
        .when(F.col("user_followers") > 50_000, "P2_influencer")
        .when(F.col("is_retweet") & (F.col("user_followers") > 10_000), "P3_viral_spread")
        .when(F.col("text").rlike(r"(?i)pump|dump|moon|giveaway"), "P4_suspicious_language")
    )
    return (
        tweets.withColumn("alert_priority", priority)
        .where(F.col("alert_priority").isNotNull())
        .select(
            "crypto_type", "user_name", "alert_priority",
            "user_followers", "text", EVENT_TIME,
        )
    )


def alert_metrics(alerts: DataFrame) -> DataFrame:
    """5m/1m alert volumes per priority (reference
    ``streaming/job5.py:243-251``)."""
    return windowed_agg(
        alerts, EVENT_TIME, "5 minutes",
        [F.count(F.lit(1)).alias("n_alerts")],
        slide="1 minute", keys=["crypto_type", "alert_priority"],
    )
