"""Data-quality expectations — declarative constraint validation
(Deequ / Great Expectations analog, public methods) evaluated with the
fewest possible passes:

- **row-local checks** (not-null, range, regex, set-membership) fold
  into ONE aggregate pass over the table: each check is a
  ``sum(violation_condition)`` — map-side combinable, zero extra scans
  however many checks run;
- **uniqueness** is one groupBy on the key (the only shuffle it needs);
- **referential integrity** is a left-anti join against the referenced
  key set (broadcast when the dimension is small).

The report is a tiny ``(check_name, n_violations, passed)`` relation —
rows per check, not per violation, so the output is driver-safe at any
table size.  Violation ROW capture (for quarantine) is a separate
``violations_*`` helper the caller applies only to checks that failed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    """A row-local expectation: ``violation`` is a boolean Column that
    is true when THE ROW VIOLATES the expectation."""

    name: str
    violation: Column


def not_null(name: str, col: str) -> RowCheck:
    return RowCheck(name, F.col(col).isNull())


def in_range(name: str, col: str, lo, hi) -> RowCheck:
    c = F.col(col)
    return RowCheck(name, c.isNull() | (c < lo) | (c > hi))


def in_set(name: str, col: str, allowed: list) -> RowCheck:
    c = F.col(col)
    return RowCheck(name, c.isNull() | ~c.isin(allowed))


def matches(name: str, col: str, pattern: str) -> RowCheck:
    c = F.col(col)
    return RowCheck(name, c.isNull() | ~c.rlike(pattern))


def row_checks_report(df: DataFrame, checks: list[RowCheck]) -> DataFrame:
    """ALL row-local checks in one aggregate pass: one
    ``sum(violation)`` per check, then unpivoted to
    ``(check_name, n_violations)`` rows."""
    agg = df.agg(
        *[
            F.sum(c.violation.cast("long")).alias(c.name)
            for c in checks
        ]
    )
    stack = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    return agg.selectExpr(
        f"stack({len(checks)}, {stack}) as (check_name, n_violations)"
    )


def uniqueness_report(df: DataFrame, name: str, keys: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (so a key appearing
    k times contributes k-1)."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.lit(name).alias("check_name"),
        F.sum(F.col("__n") - 1).alias("n_violations"),
    )


def referential_report(
    df: DataFrame, name: str, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """Violations = rows whose foreign key has no match in ``dim``
    (nulls count as orphans).  Anti-join; broadcast the key set when
    small."""
    keys = F.broadcast(dim.select(F.col(pk).alias(fk)).distinct())
    orphans = df.select(fk).join(keys, fk, "left_anti")
    return orphans.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def quality_report(
    df: DataFrame,
    row_checks: list[RowCheck] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    references: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Composite report: every check one row ``(check_name,
    n_violations, passed)``.  Row-local checks cost ONE pass total;
    each uniqueness check one shuffle; each reference one anti-join."""
    parts = []
    if row_checks:
        parts.append(row_checks_report(df, row_checks))
    for name, keys in (unique_keys or {}).items():
        parts.append(uniqueness_report(df, name, keys))
    for name, fk, dim, pk in references or []:
        parts.append(referential_report(df, name, fk, dim, pk))
    if not parts:
        raise ValueError("no checks supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
