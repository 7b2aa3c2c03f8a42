"""Deterministic weighted sampling without replacement (A-ES).

Corpus curation constantly needs "take k documents per group with
probability proportional to weight" — quality-weighted subcorpora,
per-source mixing, eval-set draws.  The public algorithm is
Efraimidis–Spirakis A-ES: give every row the key ``u^(1/w)`` (``u``
uniform) and keep the k largest — equivalently keep the k SMALLEST
exponential clocks ``-ln(u)/w``.  One pass, embarrassingly parallel,
no global sort: the per-group top-k is a partitioned window (or
``relational.top_k`` for a single group).

Determinism + cross-engine exactness (the dsir/bm25 discipline):

- ``u`` is derived, not drawn: the first 12 hex digits of
  ``md5(seed || id)`` as an integer ``h`` give ``u = (h+1) / 2^48`` —
  identical in any engine with md5 (the pipeline.hash_bucket idiom),
  replayable across runs, and seed-switchable.
- the clock is quantized to integer micro-nats::

      priority_micro = round(1e6 · ln(1/u) / w)

  Both engines evaluate the same double ``ln`` of the same rational;
  they can disagree only by ~2 ulp (≈3e-9 absolute at the ≤3.3e7
  magnitude here), so a divergence needs the true value within 3e-9 of
  a .5 rounding boundary — tests/test_sampling.py measures the
  fixture's minimum boundary margin and pins it orders of magnitude
  above that.  Ranking then compares identical integers, with the id
  as an explicit total-order tie-break.

Scale: weights and ids never leave their partition until the per-group
top-k; the window is partitioned by the group key (bounded state k per
group).  At 100 TB this is the sampling shape that replaces "global
sort by random() and take k" — which is a full-corpus shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LOG_SCALE = 1_000_000  # micro-nats, matching operators/dsir.py
_HEX_DIGITS = 12  # 48 bits of md5 → u has 2^-48 granularity


def exp_clock_micro(id_col: F.Column, weight_col: F.Column, seed: str) -> F.Column:
    """The quantized A-ES exponential clock ``round(1e6·ln(1/u)/w)``
    with ``u = (md5_48(seed||id)+1) / 2^48``.  Smaller = more likely
    selected; weight must be a positive integer column."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(float(1 << (4 * _HEX_DIGITS)))
    return F.round(F.lit(float(LOG_SCALE)) * -F.log(u) / weight_col).cast("long")


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "aes-v1",
) -> DataFrame:
    """k-per-group weighted sample without replacement (A-ES).

    Returns the input columns plus ``priority_micro`` and ``rank``
    (1..k per group, ordered by the clock then ``id_col``).  Rows with
    non-positive weight are excluded (zero-weight rows must never be
    drawn; the exponential clock is undefined for them).
    """
    clock = exp_clock_micro(F.col(id_col), F.col(weight_col), seed)
    w = Window.partitionBy(*group_cols).orderBy("priority_micro", id_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("priority_micro", clock)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
