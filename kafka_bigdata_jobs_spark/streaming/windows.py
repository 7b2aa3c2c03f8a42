"""Watermarked window aggregations (SURVEY.md §2.10 T1–T3).

Each function is a plain ``DataFrame -> DataFrame`` transform that works
identically on a batch frame (window() is just a grouping expression)
and on a stream (where the watermark additionally bounds state and
enables append-mode emission).  That duality is the engine's test
oracle: run the same transform both ways on the same data and compare
(SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference defaults: 2-minute lateness, 5m/1m sliding metrics windows
#: (streaming/job1_bots.py:147, streaming/job2.py:175-181).
DEFAULT_WATERMARK = "2 minutes"


def with_watermark(
    df: DataFrame, ts_col: str, delay: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Apply a watermark when (and only when) the frame is streaming —
    lets one transform serve both modes."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: Sequence[Column],
    slide: str | None = None,
    keys: Sequence[str] = (),
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Tumbling (no ``slide``) or sliding window aggregation.

    Output projects ``window_start``/``window_end`` from the window
    struct (reference ``streaming/job2.py:184-185``).  State cost of a
    sliding window is duration/slide overlapping panes per key — 5x for
    the reference's 5m/1m — bounded by watermark eviction.
    """
    w = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    out = (
        with_watermark(df, ts_col, watermark)
        .groupBy(w.alias("window"), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def high_frequency_keys(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    window_duration: str = "60 seconds",
    min_count: int = 3,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Keys exceeding a count threshold within a tumbling window — the
    reference's high-frequency bot rule (3+ tweets/user/minute,
    ``streaming/job1_bots.py:146-158``): windowed count + HAVING."""
    return windowed_agg(
        df,
        ts_col,
        window_duration,
        [F.count(F.lit(1)).alias("tweet_count")],
        keys=key_cols,
        watermark=watermark,
    ).where(F.col("tweet_count") >= min_count)
