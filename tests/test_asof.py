"""As-of join semantics on hand-built fixtures: ties, tolerance,
no-match rows, and key isolation."""

from __future__ import annotations

from datetime import datetime

from kafka_bigdata_jobs_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_picks_latest_prior_and_respects_keys(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:30")),
            (2, "A", _ts("2024-01-01 10:02:00")),
            (3, "B", _ts("2024-01-01 10:00:30")),
            (4, "C", _ts("2024-01-01 10:00:00")),  # no quote for C
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:01:00"), 101.0),
            ("B", _ts("2024-01-01 10:00:30"), 200.0),  # exact tie
            ("B", _ts("2024-01-01 10:00:31"), 201.0),  # later -> invisible
        ],
        "sym string, ts timestamp, px double",
    )
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
        value_cols=["px"], matched_ts="quote_ts",
    )
    got = {r["trade_id"]: (r["px"], r["quote_ts"]) for r in out.collect()}
    assert got[1] == (100.0, _ts("2024-01-01 10:00:00"))
    assert got[2] == (101.0, _ts("2024-01-01 10:01:00"))
    # tie: simultaneous quote matches (DuckDB ASOF >= semantics)
    assert got[3] == (200.0, _ts("2024-01-01 10:00:30"))
    # inner semantics: trade with no prior quote is dropped
    assert 4 not in got


def test_asof_tolerance_drops_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 12:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 09:00:00"), 1.0)],
        "k string, ts timestamp, v double",
    )
    loose = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    tight = asof_join(left, right, ["k"], "ts", "ts", ["v"], tolerance="1 hour")
    assert loose.count() == 1
    assert tight.count() == 0
