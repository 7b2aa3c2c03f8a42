"""Incremental materialized-view maintenance: mergeable partial state.

The classic continuous-aggregate pattern (hypertable rollups, Kappa
batch views): keep the view's state at a grain where every aggregate is
MERGEABLE — counts and sums merge by addition, distincts merge only if
the distinct key stays IN the state grain (exact) or becomes a sketch
(approximate, see the HLL rollup in the suite).  New data then folds in
as ``merge(state, partials(delta))`` — cost proportional to the DELTA,
never a rescan of history.

State grain here: one row per (bucket, entity) with additive partials.
Serving re-aggregates the (tiny) state, where the exact distinct-entity
count is a plain row count.  The reference recomputes its daily
analytics from the full CSV every run (`batch/job2_historico.py:96-118`)
— at 100 TB that's the difference between touching a day's delta and
touching everything.

Deltas must be exactly-once (dedup upstream / manifest-committed
sinks): the merge is additive, so a replayed delta double-counts —
pinned by a test, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import cents


def daily_user_partials(events: DataFrame) -> DataFrame:
    """Partial state for the daily-volume view at (day, user) grain:
    additive counts and exact cents sums."""
    return events.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.col("user_id").alias("user_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
        F.sum(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("n_purchases"),
    )


def merge_partials(state: DataFrame, delta_partials: DataFrame) -> DataFrame:
    """Fold a delta's partials into the state: union + additive re-agg
    on the state grain.  Shuffles only (state + delta) rows — at scale,
    partition state by day so the merge rewrites touched days only."""
    return (
        state.unionByName(delta_partials)
        .groupBy("day", "user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
            F.sum("n_purchases").alias("n_purchases"),
        )
    )


def serve_daily_volume(state: DataFrame) -> DataFrame:
    """Answer the daily-volume query from state alone: the exact
    distinct-user count is a row count at this grain."""
    return state.groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("uniq_users"),
        F.sum("value_cents").alias("value_cents"),
        F.sum("n_purchases").alias("n_purchases"),
    )
