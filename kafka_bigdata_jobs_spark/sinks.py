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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed parquet table.

    Bucketing pre-shuffles the data ONCE at write time: two tables
    bucketed on the same keys with the same bucket count co-locate, so
    every later equi-join/aggregation on those keys runs shuffle-free
    (verified in ``tests/test_layout.py`` — no Exchange in the join
    plan).  At 100 TB this converts the recurring fact-fact shuffle —
    the single most expensive operation in the cluster — into a
    write-time cost paid once; pick the bucket count so one bucket
    ≈ 100–500 MB at target scale.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


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
