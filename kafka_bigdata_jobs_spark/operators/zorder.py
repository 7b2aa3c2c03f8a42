"""Z-order (Morton) interleaved keys for multi-column data layout.

Single-column range sorting (``sinks.write_sorted_parquet``) gives
perfect footer pruning on ONE column and none on any other.  When the
filter workload hits two columns (time AND tenant, user AND value), the
scalable answer is a space-filling curve: interleave the bits of both
normalized columns into one Morton key and range-sort on that.  Every
output file then covers a compact rectangle-ish block of the 2-D key
space, so a predicate on EITHER column intersects only the files whose
block crosses that slab — O(sqrt(files)) instead of all of them.  This
is the layout trick behind Delta/Iceberg ``ZORDER BY``, built here from
plain Spark expressions (no table format required).

Everything is integer arithmetic end-to-end (normalize by integer
division, interleave by shift/mask), so the exact same key is
computable in any engine and the suite can oracle-check it; the
expression text is generated once per dialect by ``morton_sql``.

Why not Hilbert: Hilbert curves have marginally better locality but
need per-level state that doesn't compile to a flat expression; Morton
is a pure bit-shuffle and whole-stage-codegen friendly.  At 100 TB the
two-pass shape stays cheap: pass 1 is a MIN/MAX agg (combinable,
broadcastable), pass 2 tags each row with a JVM-side expression —
no Python, no UDF, no extra shuffle beyond the range partitioning the
write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_sql(col: str, lo: str, hi: str, levels: int, dialect: str) -> str:
    """Map ``col`` in [lo, hi] to an integer level in [0, levels).

    Integer division keeps it engine-exact: ((v - lo) * (levels-1)) is
    at most range * levels, well inside int64 for sane ranges.
    """
    div = "DIV" if dialect == "spark" else "//"
    span = f"({hi} - {lo})"
    scaled = f"(({col} - {lo}) * {levels - 1})"
    return f"(CASE WHEN {span} <= 0 THEN 0 ELSE {scaled} {div} {span} END)"


def _interleave_sql(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton key: bit b of ``x`` lands at position 2b+1, of ``y`` at 2b.

    Terms occupy disjoint bit positions, so ``+`` is exact (no carries)
    and parses identically everywhere.
    """
    terms = []
    for b in range(bits):
        if dialect == "spark":
            xt = f"shiftleft(shiftright({x}, {b}) & 1, {2 * b + 1})"
            yt = f"shiftleft(shiftright({y}, {b}) & 1, {2 * b})"
        else:
            xt = f"((({x} >> {b}) & 1) << {2 * b + 1})"
            yt = f"((({y} >> {b}) & 1) << {2 * b})"
        terms.append(xt)
        terms.append(yt)
    return "(" + " + ".join(terms) + ")"


def morton_sql(
    xcol: str,
    ycol: str,
    xlo: str,
    xhi: str,
    ylo: str,
    yhi: str,
    bits: int = 8,
    dialect: str = "spark",
) -> str:
    """Full Morton-key expression text for ``dialect`` ∈ {spark, duckdb}.

    ``xlo``/``xhi``/``ylo``/``yhi`` are expression strings (literals or
    correlated stats columns), so callers can inline either eagerly
    computed bounds or a stats-CTE cross join.
    """
    levels = 1 << bits
    nx = _norm_sql(xcol, xlo, xhi, levels, dialect)
    ny = _norm_sql(ycol, ylo, yhi, levels, dialect)
    return _interleave_sql(nx, ny, bits, dialect)


def with_morton_key(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    key_name: str = "__zkey",
) -> DataFrame:
    """Tag each row with the Morton key of (xcol, ycol).

    Pass 1 computes integer min/max bounds (tiny combinable agg, one
    driver round-trip); pass 2 is a pure codegen expression — the same
    two-pass shape works unchanged on a 1000-executor cluster.  Both
    columns must already be integral (quantize doubles to cents first).
    """
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
    ).first()
    expr = morton_sql(
        xcol, ycol, str(lo_x), str(hi_x), str(lo_y), str(hi_y), bits, "spark"
    )
    return df.withColumn(key_name, F.expr(expr))


def morton_filter_stats(path_glob: str, column: str, lo, hi) -> tuple[int, int]:
    """Footer-only pruning probe: of all row groups under ``path_glob``,
    how many could a [lo, hi] predicate on ``column`` skip?  Returns
    (intersecting, total).  Used by layout tests to prove the z-order
    claim directly from parquet metadata.
    """
    import glob

    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.max >= lo and st.min <= hi:
                hit += 1
    return hit, total
