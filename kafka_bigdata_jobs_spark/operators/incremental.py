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


def delta_join(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of an inner join under INSERTS:
    Δ(A ⋈ B) = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB).

    The join-IVM algebra (classic differential/DBSP result, public):
    with the old join result materialized, appending ΔA and ΔB costs
    three joins whose LEFT sides are deltas — each probe is sized by
    the delta, and when the big relations are bucketed on the join key
    the two delta-against-old joins are co-located, shuffle-free on the
    old side.  Appending the returned rows to the stored ``A_old ⋈
    B_old`` yields exactly ``A_new ⋈ B_new``; downstream additive
    aggregates fold the delta via :func:`merge_partials`-style re-agg.
    Deletes/updates need signed multiplicities (retractions) — out of
    scope here; the append-only case IS the streaming-ingest shape.
    """
    return (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def delta_join_signed(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    weight_col: str = "__w",
) -> DataFrame:
    """Join IVM under inserts AND deletes: signed-multiset differential.

    ``delta_a`` / ``delta_b`` carry a ``weight_col`` of +1 (insert) or
    -1 (retraction).  Returns the signed delta of the join,

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB,

    with the output weight = product of input weights (old rows weigh
    +1).  Folding into a stored aggregate is then a SIGNED sum: counts
    add ``w``, sums add ``w * x`` — the Z-set/DBSP algebra (public
    differential-dataflow result) in plain columns.  A retraction of an
    A-row cancels every joined pair it contributed, including pairs
    against rows ΔB retracts in the same batch: that pair is subtracted
    twice by the two outer terms and added back once by ΔA ⋈ ΔB
    ((-1)·(-1) = +1), landing at net -1 — the cross-term is what makes
    the algebra exact, not an optimization.  Same cost shape as
    :func:`delta_join`: every probe side is delta-sized.
    """
    w = F.col(weight_col)
    a_plus = a_old.withColumn(weight_col, F.lit(1))
    b_plus = b_old.withColumn(weight_col, F.lit(1))

    def _term(left: DataFrame, right: DataFrame) -> DataFrame:
        lw = left.withColumnRenamed(weight_col, "__wl")
        rw = right.withColumnRenamed(weight_col, "__wr")
        return (
            lw.join(rw, on)
            .withColumn(weight_col, (F.col("__wl") * F.col("__wr")).cast("int"))
            .drop("__wl", "__wr")
        )

    return (
        _term(delta_a, b_plus)
        .unionByName(_term(a_plus, delta_b))
        .unionByName(_term(delta_a, delta_b))
    )
