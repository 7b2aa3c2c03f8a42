"""Batch sinks (SURVEY.md §2.2 K4/K5).

The reference ``coalesce(1)``s every CSV report
(``batch/job1_locations.py:143-158``) — a single-writer bottleneck that
cannot absorb 100 TB.  Policy here: partitioned parquet for data,
``coalesce(1)`` allowed only for bounded report frames (caller passes
``single_file=True`` and the row count is expected to be small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv_report(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
    header: bool = True,
) -> None:
    """CSV output; ``single_file`` only for small report frames."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)
