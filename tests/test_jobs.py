"""Reference-job transform tests over synthetic tweet frames.

These validate the five re-expressed streaming jobs' semantics in batch
mode (the transforms are mode-agnostic; streaming execution itself is
covered by test_streaming.py).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.cleaning import clean_locations
from kafka_bigdata_jobs_spark.streaming import jobs

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tweet(name, crypto="bitcoin", loc="Lima, Peru", desc="hi", created="2020-01-01",
           followers=100, friends=50, favs=10, verified=False, text="hello world",
           hashtags="['btc']", source="Twitter Web App", retweet=False, ts=T0):
    return (crypto, name, loc, desc, created, followers, friends, favs, verified,
            str(ts), text, hashtags, source, retweet, str(ts), ts)


COLS = ["crypto_type", "user_name", "user_location", "user_description",
        "user_created", "user_followers", "user_friends", "user_favourites",
        "user_verified", "date", "text", "hashtags", "source", "is_retweet",
        "timestamp", "event_time"]


@pytest.fixture()
def tweets(spark):
    rows = [
        _tweet("alice"),
        _tweet("burst", ts=T0),
        _tweet("burst", ts=T0 + dt.timedelta(seconds=10)),
        _tweet("burst", ts=T0 + dt.timedelta(seconds=20)),
        _tweet("newbot", created="2024-01-01", favs=5000),
        _tweet("imbalanced", followers=3, friends=1000, desc=""),
        _tweet("vip", verified=True, followers=500_000),
        _tweet("shiller", text="PUMP this coin giveaway!!"),
        _tweet("nowhere_man", loc="Worldwide"),
        _tweet("urlloc", loc="http://spam.example.com"),
    ]
    return spark.createDataFrame(rows, COLS)


def test_high_frequency_bots(spark, tweets):
    out = jobs.high_frequency_bots(tweets).collect()
    assert len(out) == 1
    assert out[0]["user_name"] == "burst" and out[0]["tweet_count"] == 3


def test_bot_profile_alerts(spark, tweets):
    out = jobs.bot_profile_alerts(tweets, as_of=F.lit("2024-01-05").cast("date"))
    got = {r["user_name"]: r["alert_reason"] for r in out.collect()}
    assert got["newbot"] == "new_account_heavy_activity"
    assert got["imbalanced"] in ("default_profile_mass_follow", "follower_imbalance")
    assert "alice" not in got


def test_engagement_alerts_ladder(spark, tweets):
    out = {r["user_name"]: r["alert_priority"]
           for r in jobs.engagement_alerts(tweets).collect()}
    assert out["vip"] == "P1_vip"
    assert out["shiller"] == "P4_suspicious_language"
    assert "alice" not in out


def test_clean_locations(spark, tweets):
    out = clean_locations(tweets)
    locs = {r["user_name"]: r["location"] for r in out.collect()}
    assert "nowhere_man" not in locs          # blacklist
    assert "urlloc" not in locs               # URL junk collapses / rejected
    assert locs["alice"] == "Lima, Peru"


def test_trending_hashtags_batch_topk(spark, tweets):
    out = jobs.trending_hashtags(tweets, top_n=5).collect()
    assert out, "no hashtag windows"
    assert all(r["rank"] <= 5 for r in out)
    assert {r["hashtag"] for r in out} == {"btc"}


def test_sentiment_metrics_runs(spark, tweets):
    out = jobs.sentiment_metrics(tweets).collect()
    assert sum(r["n_tweets"] for r in out) >= len(COLS) - 6  # windows overlap: >= rows
