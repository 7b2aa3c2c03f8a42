"""Embedding similarity search: brute-force cosine top-k + IVF scale path.

The fixture ``embeddings`` table carries ``embedding array<float>[64]``
and an integer ``label`` (used as a precomputed coarse-quantizer cell,
i.e. the IVF assignment a k-means step would produce).

Scale design:

- **brute force** — queries broadcast against the corpus: one pass,
  no shuffle of the corpus, per-query top-k via ranking window.  This
  is the exact baseline; cost O(|corpus|·|queries|·dim).
- **IVF** — restrict the join to the query's cell (equi-join on the
  cell id) before scoring: the per-query scan drops to the cell's
  fraction of the corpus.  Same downstream scoring/top-k code.

All cosine math is expression-only (``zip_with`` + ``aggregate`` folds
in whole-stage codegen), computed in double; sums run left-to-right so
the DuckDB oracle (``list_dot_product`` on DOUBLE[]) is bit-comparable
after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Left-to-right sequential dot product (bit-stable across engines).

    With ``dim`` known, the sum unrolls into a flat codegen-compilable
    expression — higher-order-function lambdas are interpreted
    per-element in Spark and benched ~20× slower on the self-join
    workloads.  The fold fallback handles unknown dims.
    """
    if dim is not None:
        out = a.getItem(0) * b.getItem(0)
        for i in range(1, dim):
            out = out + a.getItem(i) * b.getItem(i)  # left-assoc, oracle-ordered
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot/sqrt(|a|²·|b|²) — formula mirrored exactly by the oracle."""
    return dot(a, b, dim) / F.sqrt(dot(a, a, dim) * dot(b, b, dim))


def cosine_prenormed(a: Column, b: Column, na2: Column, nb2: Column, dim: int | None) -> Column:
    """Cosine with precomputed squared norms (norms are O(n), pair dots
    are O(n²) — never recompute norms inside the pair join)."""
    return dot(a, b, dim) / F.sqrt(na2 * nb2)


def topk_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    cell_col: str | None = None,
    decimals: int = 6,
    dim: int | None = 64,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries`` must carry the same ``id_col``/``vec_col`` (and
    ``cell_col`` for IVF).  Queries are broadcast — the corpus never
    shuffles for scoring; the only shuffle is the per-query top-k
    window on ``query_id``, whose cardinality is |queries|·|corpus
    slice|.  With ``cell_col`` the join keys on the cell id first (IVF:
    only the query's cell is scanned).
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(F.col(vec_col)).alias("__qv"),
        *([F.col(cell_col).alias("__qcell")] if cell_col else []),
    ).withColumn("__qn2", dot(F.col("__qv"), F.col("__qv"), dim))
    from .relational import spread

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(F.col(vec_col)).alias("__cv"),
        *([F.col(cell_col).alias("__ccell")] if cell_col else []),
    ).withColumn("__cn2", dot(F.col("__cv"), F.col("__cv"), dim))
    if cell_col:
        joined = c.join(F.broadcast(q), F.col("__qcell") == F.col("__ccell"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = (
        joined.where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine_prenormed(
                    F.col("__qv"), F.col("__cv"), F.col("__qn2"), F.col("__cn2"), dim
                ),
                decimals,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane components in
    [-0.5, 0.5), derived from a fixed LCG (no runtime randomness)."""
    out = []
    state = (seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) % (1 << 64)
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append((state >> 11) / float(1 << 53) - 0.5)
    return out


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 12) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(vec · plane_b).

    Cosine-similar vectors agree on most sign bits, so near neighbors
    land in the same bucket with high probability; 12 planes → 4096
    buckets.  Unrolled dot products keep this in whole-stage codegen.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(p, dim)
        d = vec.getItem(0) * F.lit(plane[0])
        for i in range(1, dim):
            d = d + vec.getItem(i) * F.lit(plane[i])
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def topk_neighbors_hyperplane_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket.  The recall/speed trade is governed by
    ``n_planes`` (more planes → smaller buckets → faster, lower recall);
    production variants multi-probe neighboring buckets.  Reuses the
    exact scoring/ranking path with the bucket as the IVF cell."""
    c = corpus.withColumn(
        "__bucket", hyperplane_bucket(as_double_vec(F.col(vec_col)), dim, n_planes)
    )
    q = queries.withColumn(
        "__bucket", hyperplane_bucket(as_double_vec(F.col(vec_col)), dim, n_planes)
    )
    return topk_neighbors(
        c, q, id_col, vec_col, k=k, cell_col="__bucket", dim=dim
    )


def embedding_near_dup_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    dim: int = 64,
    margin: float = 1e-6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via numpy-blocked candidate
    generation + exact expression verification.

    Stage 1 broadcasts the (id, vector) matrix to every partition and
    runs a vectorized ``mapInPandas`` block·corpusᵀ matmul — dense
    linear algebra is where a Pandas UDF beats row-expressions by an
    order of magnitude.  It emits candidate id pairs above
    ``threshold - margin`` (margin covers numpy's pairwise-summation FP
    drift vs the sequential oracle order).  Stage 2 recomputes the
    candidates' cosines with the bit-stable unrolled expression, so the
    OUTPUT is identical to :func:`embedding_near_dup_pairs` — numpy
    only decides which pairs get verified, never a final value.

    The broadcast corpus bounds this at ~corpus_size·dim·8 bytes per
    executor; beyond that, partition by LSH/IVF cell first
    (``cell_col`` on the exact variant) so each block only multiplies
    against its cell.
    """
    from .relational import spread

    base = spread(df).select(
        F.col(id_col).alias("__id"), as_double_vec(F.col(vec_col)).alias("__v")
    ).cache()
    rows = base.collect()
    import numpy as np

    ids = np.array([r["__id"] for r in rows], dtype=np.int64)
    mat = np.array([r["__v"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = df.sparkSession.sparkContext.broadcast((ids, mat, norms))
    cut = threshold - margin

    cand_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def gen(it):
        import numpy as _np
        import pandas as _pd

        c_ids, c_mat, c_norms = bc.value
        for pdf in it:
            block_ids = pdf["__id"].to_numpy(dtype=_np.int64)
            block = _np.array(list(pdf["__v"]), dtype=_np.float64)
            if block.size == 0:
                continue
            bn = _np.sqrt((block * block).sum(axis=1))
            sims = (block @ c_mat.T) / _np.outer(bn, c_norms)
            bi, cj = _np.nonzero(sims >= cut)
            a, b = block_ids[bi], c_ids[cj]
            keep = a < b
            yield _pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    cands = base.mapInPandas(gen, cand_schema)
    a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine", F.round(cosine(F.col("__va"), F.col("__vb"), dim), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    cell_col: str | None = None,
    dim: int | None = 64,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Brute self-join bounded to the upper triangle; with ``cell_col``
    the pair search stays within cells (the LSH/IVF scale path — near
    dups land in the same cell by construction of the quantizer).
    """
    from .relational import spread

    base = spread(df).select(
        F.col(id_col).alias("__id"),
        as_double_vec(F.col(vec_col)).alias("__v"),
        *([F.col(cell_col).alias("__cell")] if cell_col else []),
    ).withColumn("__n2", dot(F.col("__v"), F.col("__v"), dim)).cache()
    left = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n2").alias("__na2"),
        *([F.col("__cell").alias("__cella")] if cell_col else []),
    )
    right = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
        F.col("__n2").alias("__nb2"),
        *([F.col("__cell").alias("__cellb")] if cell_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    if cell_col:
        cond = cond & (F.col("__cella") == F.col("__cellb"))
    return (
        left.join(right, cond)
        .withColumn(
            "cosine",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na2"), F.col("__nb2"), dim
                ),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
