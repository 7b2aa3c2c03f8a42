"""Join strategies (beyond-reference; SURVEY.md §2.4).

The reference implements zero relational joins — cross-set correlation
is union + groupBy on a discriminator.  At 100 TB an engine needs real
joins, planned deliberately:

- dimension tables (region/nation/customer-sized) → ``F.broadcast`` so
  the fact scan never shuffles;
- fact-fact equi-joins → shuffle hash / sort-merge on the key, with AQE
  skew splitting (enabled in session.py);
- existence checks → ``left_semi`` / ``left_anti`` (no payload
  duplication, no row explosion).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicitly broadcast dimension side.

    Explicit ``broadcast()`` (not just the autoBroadcast threshold):
    at 100 TB the fact side's size statistics can be missing or stale
    and a silent fallback to sort-merge would shuffle the whole fact
    table.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS: keep left rows with ≥1 match; never duplicates rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS: keep left rows with no match."""
    return left.join(right, on=on, how="left_anti")


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str | list[str] | Column]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Fact table joined against several dimensions (star schema).

    All dims broadcast by default: one pass over the fact table, zero
    shuffles before the downstream aggregation.
    """
    out = fact
    for dim, on in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how="inner")
    return out
