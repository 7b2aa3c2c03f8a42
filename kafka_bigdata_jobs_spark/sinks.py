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


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Morton (z-order) key of TWO
    columns, so range predicates on EITHER column prune files.

    :func:`write_sorted_parquet` optimizes one filter axis and abandons
    the other; this interleaves both (``operators/zorder.py``) so each
    output file covers a compact block of the 2-D key space — a
    predicate on either column touches ~O(sqrt(files)) of them.  The
    key is computed by a pure codegen expression after one tiny min/max
    agg, range-partitioned for balanced writers, and dropped before
    the write (projection after sortWithinPartitions preserves the
    per-partition order).  Both columns must be integral — quantize
    doubles to cents first.  Footer-level pruning on both axes is
    asserted in ``tests/test_layout.py``.
    """
    from .operators.zorder import with_morton_key

    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    keyed = with_morton_key(df, xcol, ycol, bits=bits)
    (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
