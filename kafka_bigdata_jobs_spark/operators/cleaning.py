"""Cleaning pipelines (SURVEY.md §2.3 P11): composed single predicates.

The reference's location cleaning chains ~30 lines of filters — and in
batch mode a Python ``for`` loop emitting 26 chained ``.filter
(contains(...))`` calls (``batch/job1_locations.py:88-89``).  Catalyst
collapses chained filters anyway (CombineFilters), but composing ONE
predicate keeps the plan small and the rule auditable.  Streaming and
batch use this same function (the reference duplicates it:
``streaming/job4_locationsreal_time.py:132-162`` vs
``batch/job1_locations.py:68-93``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Junk location strings the reference blacklists (semantics, not the
#: verbatim 26-entry list): placeholders, planets, jokes.
DEFAULT_BLACKLIST = (
    "unknown",
    "earth",
    "worldwide",
    "everywhere",
    "nowhere",
    "internet",
    "global",
    "world",
    "moon",
    "mars",
    "metaverse",
    "blockchain",
    "crypto",
    "online",
    "home",
)

#: Strip everything outside letters/spaces/commas (emoji, digits, URLs
#: collapse away) — reference regexp_replace at batch/job1_locations.py:80.
_KEEP_PATTERN = r"[^\p{L} ,.'-]"


def normalize_location(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, _KEEP_PATTERN, ""))


def valid_location(
    col: Column,
    blacklist: Sequence[str] = DEFAULT_BLACKLIST,
    min_len: int = 2,
    max_len: int = 40,
) -> Column:
    """One composed predicate: non-null, non-empty, length-bounded, not
    blacklisted, no URL-ish remnants, at least one letter."""
    c = F.lower(F.trim(col))
    return (
        col.isNotNull()
        & (c != "")
        & F.length(c).between(min_len, max_len)
        & ~c.isin(*[b.lower() for b in blacklist])
        & ~c.rlike(r"https?://|www\.|\.com|\d{3,}")
        & c.rlike(r"\p{L}")
    )


def clean_locations(
    df: DataFrame,
    location_col: str = "user_location",
    out_col: str = "location",
    blacklist: Sequence[str] = DEFAULT_BLACKLIST,
) -> DataFrame:
    """Normalize + validate location strings; rows failing the predicate
    are dropped, survivors get title-cased ``out_col``."""
    normalized = normalize_location(F.col(location_col))
    return (
        df.withColumn(out_col, normalized)
        .where(valid_location(F.col(out_col), blacklist))
        .withColumn(out_col, F.initcap(F.lower(F.col(out_col))))
    )
