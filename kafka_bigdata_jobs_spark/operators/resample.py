"""Time-series regularization: calendar spine, LOCF gap fill, and
integer-exact linear interpolation.

The continuous-analytics surface the reference's daily batch jobs imply
but never regularize (``batch/job2_historico.py`` aggregates only the
days that HAVE rows): production time-series engines (TimescaleDB's
``time_bucket_gapfill``, QuestDB ``SAMPLE BY ... FILL``) make the gaps
explicit so downstream rolling windows, trend fits, and charting see a
dense axis.  Re-expressed relationally:

1. **spine** — per key, ``sequence(min_day, max_day)`` exploded to one
   row per calendar day.  Cost: one agg over the observations plus an
   explode sized keys × days — the OUTPUT's size, irreducible.
2. **fill** — left-join observations onto the spine, then one window
   pass per direction with ``last(..., ignorenulls=True)`` carrying
   ``(day, value)`` structs: LOCF takes the backward carry; linear
   interpolation combines both carries on the integer-cents lattice::

       interp = (pv·(nd−d) + nv·(d−pd)) div (nd−pd)

   — exact BIGINT arithmetic, so the fill value-hashes across engines
   (DuckDB twin: ``last_value(... IGNORE NULLS)`` + the same formula).

Scale design: every window is partitioned BY KEY and ordered by day —
embarrassingly parallel across keys, no global ordering anywhere.  The
spine join shuffles on (key) once; with observations bucketed by key it
is co-located.  Day counts per key are bounded by the calendar range,
so per-partition window state is tiny regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_spine(df: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """One row per (key, calendar day) between each key's first and
    last observed day — ``sequence`` explode over per-key min/max."""
    rng = df.groupBy(key_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    return rng.select(
        key_col, F.explode(F.sequence("__d0", "__d1")).alias(day_col)
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Regularize a per-(key, day) integer series onto its daily spine.

    ``df`` must be unique per (key, day) (pre-aggregate first) with an
    integer ``value_col``.  Returns one row per spine day::

        key, day, observed (bool), value (original or NULL),
        locf_value   — last observation carried forward,
        interp_value — integer linear interpolation between the
                       surrounding observations (equals the
                       observation on observed days; never NULL —
                       the spine spans first..last observed day per
                       key, so every gap is interior).  Integral
                       ``div`` truncates toward zero: keep values
                       non-negative (e.g. cents) for cross-engine
                       floor/trunc agreement.
    """
    spine = daily_spine(df, key_col, day_col)
    j = spine.join(df, [key_col, day_col], "left")

    carry = F.when(
        F.col(value_col).isNotNull(),
        F.struct(F.col(day_col).alias("d"), F.col(value_col).alias("v")),
    )
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col(day_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = j.select(
        key_col,
        day_col,
        F.col(value_col).isNotNull().alias("observed"),
        F.col(value_col).alias("value"),
        F.last(carry, ignorenulls=True).over(w_back).alias("__prev"),
        F.last(carry, ignorenulls=True).over(w_fwd).alias("__next"),
    )
    return filled.select(
        key_col,
        day_col,
        "observed",
        "value",
        F.col("__prev.v").alias("locf_value"),
        F.when(F.col("observed"), F.col("value"))
        .otherwise(
            F.expr(
                "(__prev.v * datediff(__next.d, "
                f"{day_col}) + __next.v * datediff({day_col}, __prev.d)) "
                f"div datediff(__next.d, __prev.d)"
            )
        )
        .cast("long")
        .alias("interp_value"),
    )
