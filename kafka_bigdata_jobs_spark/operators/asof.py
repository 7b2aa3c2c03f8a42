"""As-of (point-in-time) join — the time-series operator Spark lacks.

For each left row, find the single most recent right row with
``right_ts <= left_ts`` for the same key (optionally within a
tolerance).  The classic use: enrich an event with the latest known
state — last quote before a trade, last view before a purchase.

Scale design — union + running ``last(ignorenulls)`` window, NOT a
range join:

- a naive join on ``key = key AND r.ts <= l.ts`` explodes to every
  earlier right row per left row (O(|L|·|R|) within a key) and then
  needs a max-per-left reduction;
- instead, tag both sides, union them, and take one window pass per
  key ordered by time: the running "last right row seen" is exactly
  the as-of match when it reaches a left row.  Cost is one shuffle on
  the key and a sort within each key partition — the same price as a
  single sort-merge join, and it holds at 100 TB because nothing is
  ever materialized per-pair.

DuckDB's native ``ASOF JOIN`` is the oracle twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    matched_ts: str = "matched_ts",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join (inner): keep left rows that have a match.

    ``value_cols`` are the right-side columns to carry (emitted under
    their own names; they must not collide with left column names).
    The matched right timestamp is exposed as ``matched_ts``.  With
    ``tolerance`` (an INTERVAL string, e.g. ``"1 hour"``), matches
    older than ``left_ts - tolerance`` are dropped.

    Tie rule: a right row whose timestamp EQUALS a left row's
    timestamp matches it (right rows sort before left rows at equal
    ``ts``, matching DuckDB ``ASOF JOIN``'s ``>=``).
    """
    from pyspark.sql.window import Window

    on = list(on)
    value_cols = list(value_cols)
    staged = [f"__r_{c}" for c in value_cols] + ["__r_ts"]

    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = (
        right.select(
            *[F.col(c) for c in on],
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__r_ts", F.col("__ts"))
        .withColumn("__is_left", F.lit(0))
    )
    both = lt.unionByName(rt, allowMissingColumns=True)

    # right rows (is_left=0) order before left rows at equal __ts, so an
    # exactly-simultaneous right row is visible to the left row's window
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_names = value_cols + [matched_ts]
    carried = [
        F.last(F.col(sc), ignorenulls=True).over(w).alias(name)
        for sc, name in zip(staged, out_names)
    ]
    out = (
        both.select("*", *carried)
        .where(F.col("__is_left") == 1)
        .where(F.col(matched_ts).isNotNull())
    )
    if tolerance is not None:
        out = out.where(
            F.col(matched_ts) >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        )
    return out.drop("__ts", "__is_left", *staged)
