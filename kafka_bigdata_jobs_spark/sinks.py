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


def _next_version_dir(path: str) -> str:
    """Pick the A/B version dir that is NOT the current symlink target.

    Deterministic names (``__v_a``/``__v_b``) instead of random suffixes
    so a crashed swap is self-repairing: the next attempt's
    ``mode("overwrite")`` write simply clobbers the half-written leftover
    (ADVICE r1: predictable recovery names).
    """
    import os

    p = path.rstrip("/")
    cur = os.readlink(p) if os.path.islink(p) else None
    base = os.path.basename(p)
    nxt = f"{base}__v_b" if cur == f"{base}__v_a" else f"{base}__v_a"
    return os.path.join(os.path.dirname(p) or ".", nxt)


def _atomic_swap_dir(path: str, new_dir: str) -> None:
    """Point ``path`` at ``new_dir`` via an atomic symlink replace.

    ``path`` is maintained as a SYMLINK to the live version dir; the
    swap is one ``os.replace`` of the link, so a reader resolving
    ``path`` sees the old version or the new one — never a missing
    directory (round-1 code moved the dir away then moved the new one
    in, leaving an ENOENT window; ADVICE r1, medium).

    Bounds of the guarantee, stated honestly: after the swap the
    previous version dir is deleted.  A reader that resolved the link
    BEFORE the swap and holds open file handles is safe (POSIX unlink);
    a reader that resolved early but only LISTS the directory after the
    delete errors out.  Full snapshot isolation needs a manifest commit
    (``sources/pydatasource.py::JsonlArchiveDataSource``) — this is the
    filesystem-native approximation.  First call on a legacy real
    directory migrates it to the pointer layout; only that one-time
    migration has a brief no-directory window.
    """
    import os
    import pathlib
    import shutil

    p = path.rstrip("/")
    pp = pathlib.Path(p)
    new_base = os.path.basename(new_dir)
    if pp.is_symlink():
        old_target = os.readlink(p)
        ptr_tmp = f"{p}__ptr_tmp"
        if os.path.lexists(ptr_tmp):
            os.remove(ptr_tmp)
        os.symlink(new_base, ptr_tmp)
        os.replace(ptr_tmp, p)  # atomic: readers never see ENOENT
        if old_target != new_base:
            shutil.rmtree(
                os.path.join(os.path.dirname(p) or ".", old_target),
                ignore_errors=True,
            )
    elif pp.exists():
        # One-time migration from a plain directory (non-atomic window).
        old = f"{p}__old_recovery"
        if os.path.exists(old):
            shutil.rmtree(old)
        shutil.move(p, old)
        os.symlink(new_base, p)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.symlink(new_base, p)


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet directory in place: read, coalesce
    to ``ceil(total_bytes / target)`` files, swap via the atomic
    version-pointer (:func:`_atomic_swap_dir`).

    Small files are the silent scan killer at scale (per-file open +
    footer read + scheduling overhead dwarfs row decode below ~16 MB);
    streaming sinks produce one file per micro-batch per partition, so
    periodic compaction is part of operating any landing zone.  File
    count derives from actual byte size, not row counts, so the same
    call works at any SF.  ``sort_within_by`` re-sorts rows inside each
    output file so min/max footer stats stay selective after the merge.
    Returns the output file count.
    """
    import math
    import pathlib

    df = spark.read.parquet(path)
    total = sum(
        f.stat().st_size
        for f in pathlib.Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    new_dir = _next_version_dir(path)
    out.write.mode("overwrite").parquet(new_dir)
    _atomic_swap_dir(path, new_dir)
    return n_files


def delete_keys_rewrite(
    spark,
    path: str,
    keys_df,
    key_col: str,
) -> int:
    """Targeted row deletion (GDPR erasure) on an immutable parquet
    directory: anti-join the key set, rewrite, swap.

    The key set is broadcast (erasure requests are tiny next to the
    table); every surviving row is written back once.  At warehouse
    scale, restrict the rewrite to affected partitions by joining the
    request keys against partition values first — this helper is the
    whole-directory form.  Swap semantics: :func:`_atomic_swap_dir`.
    Returns surviving row count.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    kept = df.join(F.broadcast(keys_df), on=key_col, how="left_anti")
    new_dir = _next_version_dir(path)
    kept.write.mode("overwrite").parquet(new_dir)
    n = spark.read.parquet(new_dir).count()
    _atomic_swap_dir(path, new_dir)
    return n
