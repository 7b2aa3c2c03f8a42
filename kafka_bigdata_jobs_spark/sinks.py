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


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort the data on ``sort_cols`` before writing,
    so parquet row-group min/max statistics become NARROW and DISJOINT
    along the sort axis.

    Why it matters at 100 TB: parquet readers prune at two levels —
    files (footer stats) and row groups within a file.  A random layout
    makes every min/max range span the whole domain, so a time-range
    predicate still opens every file; a range-sorted layout turns the
    same predicate into "skip all but the few row groups whose range
    intersects".  This is the cheap, format-native cousin of a
    clustered index, and the right default layout for any column that
    dominates the filter workload (event time, tenant id).

    ``repartitionByRange`` samples the data to build balanced range
    bounds (one skewed writer task would otherwise stall the write);
    ``sortWithinPartitions`` orders rows inside each output file so
    row-group stats inside a file are disjoint too.  Verified in
    ``tests/test_layout.py`` by reading the written footers: sorted
    row-group ranges must not overlap, and a point-range predicate
    must select a strict subset of row groups.
    """
    cols = list(sort_cols)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
