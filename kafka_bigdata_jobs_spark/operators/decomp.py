"""Distributed linear-algebra decompositions over embedding columns
(beyond-reference: the reference has no vector-analytics surface).

The one pattern that matters at 100 TB: a d-dimensional PCA/covariance
never materializes an n×d matrix anywhere — it reduces the data to the
SUFFICIENT STATISTICS ``(n, Σx, ΣxᵀX)``: one map pass emitting
per-partition partials (each a single row of ~d² numbers) and one tiny
reduce.  For d = 64 a partial is 64·65·8 B ≈ 33 KB; a thousand
executors produce a few MB for the driver to eigendecompose — the
classic tall-skinny Gram trick (same shape as spark.ml's
``RowMatrix.computeCovariance``; public method).

Determinism discipline: embeddings are quantized to 1e-4 grid int64
BEFORE accumulation, so the Gram entries are exact integers and the
result is bit-identical under any partitioning/summation order (float
accumulation would drift in the last ulp per partition order).  The
eigendecomposition then runs on the exact integer matrix scaled once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Quantization grid: embedding components land on multiples of 1e-4.
#: Unit-norm components scale to ~1e4; pairwise products ~1e8; 1e10 rows
#: of partial sums stay < 2^63.  The PCA answers (variance *shares*)
#: move O(1e-4) under this grid — far below any decision threshold.
QUANT = 10_000


def gram_sufficient_stats(df: DataFrame, vec_col: str, dim: int):
    """One distributed pass -> exact integer sufficient statistics.

    Returns ``(n, s, G)``: row count, per-dimension sums (len d,
    int64), and the upper-triangular Gram matrix ΣxᵀX flattened
    (d·(d+1)/2 int64 entries), all on the quantized grid.

    mapInPandas emits ONE partial row per Arrow batch (bounded driver
    traffic: partitions × 33 KB); the final reduce is a numpy sum over
    those few rows — never a shuffle of the data itself.
    """
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Q = np.floor(X * QUANT).astype(np.int64)
            G = (Q.T @ Q)[iu]
            yield pd.DataFrame(
                {
                    "n": [len(Q)],
                    "s": [Q.sum(axis=0).tolist()],
                    "g": [G.tolist()],
                }
            )

    part = df.select(vec_col).mapInPandas(
        partials, "n long, s array<long>, g array<long>"
    )
    rows = part.collect()  # bounded: one small row per Arrow batch
    import numpy as np

    n = int(sum(r["n"] for r in rows))
    s = np.sum([r["s"] for r in rows], axis=0, dtype=np.int64)
    g = np.sum([r["g"] for r in rows], axis=0, dtype=np.int64)
    return n, s, g


def pca_variance_rows(df: DataFrame, vec_col: str, dim: int, top: int = 8):
    """Eigen-spectrum of the exact covariance: list of
    ``(component, eigval_scaled, var_share_bp, cum_share_bp)`` rows.

    Covariance (times n²·QUANT²): ``C = n·G − s sᵀ``, assembled in
    arbitrary-precision Python ints (object dtype), so the integer math
    truly cannot overflow — entries reach ~n²·QUANT², which exceeds
    int64 already at n ≈ 3·10⁵ rows, far below the 1e10-row envelope
    (round-2 advisor finding).  The ONE lossy step is the final cast to
    float64 for LAPACK: entries beyond 2^53 round to the nearest
    representable double (relative error ≤ 2⁻⁵³ per entry, and
    eigenvalues of a symmetric matrix are Lipschitz-1 in the entries by
    Weyl's inequality, so the spectrum shifts by at most
    ‖rounding‖₂ ≈ 2⁻⁵³·‖C‖ — irrelevant to basis-point shares).
    """
    import numpy as np

    n, s, g = gram_sufficient_stats(df, vec_col, dim)
    iu = np.triu_indices(dim)
    G = np.zeros((dim, dim), dtype=object)
    G[iu] = g.astype(object)
    G = G + G.T - np.diag(np.diag(G))
    s_obj = s.astype(object)
    C_int = n * G - np.outer(s_obj, s_obj)  # exact: Python-int arithmetic
    C = C_int.astype(np.float64)  # the single, final float conversion
    w = np.linalg.eigvalsh(C)[::-1]  # descending
    total = float(w.sum())
    out = []
    cum = 0
    for i in range(min(top, dim)):
        share_bp = int(np.floor(10000.0 * w[i] / total)) if total > 0 else 0
        cum += share_bp
        out.append((i, int(np.floor(w[i] / (QUANT * QUANT))), share_bp, cum))
    return out
