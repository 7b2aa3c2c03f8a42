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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting for a pathologically skewed key.

    The skewed side gets a deterministic salt ``hash(row) % salt``; the
    other side replicates each row ``salt`` times.  The shuffle then
    spreads one hot key over ``salt`` reducers.  AQE's skew-join split
    (enabled in session.py) covers most cases at runtime; explicit
    salting is for the keys AQE can't split — e.g. one key holding >50%
    of a 100 TB table, where a single post-split partition still
    overflows an executor.  Results are identical to a plain join.
    """
    salted_left = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    replicated_right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(
        replicated_right,
        (F.col(skewed_key) == F.col(other_key)) & (salted_left["__salt"] == replicated_right["__salt"]),
        how,
    )
    return out.drop("__salt")


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


#: Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter
#: rule): when a shuffle join's small side carries a selective filter,
#: the optimizer can build a bloom filter over its join keys and push a
#: ``might_contain`` probe into the BIG side's scan — rows that cannot
#: match are dropped before the shuffle, the dominant cost at 100 TB.
#: Spark's defaults only engage past large scan-size thresholds (the
#: application side must exceed 10 GB), so the effect is invisible —
#: and untestable — at local fixture scale.  These settings make the
#: rule fire at any size; production keeps the size guards but raises
#: creationSideThreshold so dimension-filtered fact joins qualify.
RUNTIME_FILTER_CONF: dict[str, str] = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def with_runtime_filter(spark) -> None:
    """Enable runtime bloom-filter pruning for subsequent plans built on
    this session (idempotent; plan-asserted by
    tests/test_runtime_filter.py).  Call before composing a
    selective-dim x big-fact shuffle join; broadcast joins don't need
    it (dynamic partition/file pruning covers those)."""
    for k, v in RUNTIME_FILTER_CONF.items():
        spark.conf.set(k, v)
