"""Gram sufficient statistics + PCA spectrum: numpy parity and
partition-order invariance (the properties the rows-only driver check
cannot see)."""

from __future__ import annotations

import numpy as np

from kafka_bigdata_jobs_spark.operators.decomp import (
    QUANT,
    gram_sufficient_stats,
    pca_variance_rows,
)
from kafka_bigdata_jobs_spark.schemas import load_table


def test_gram_stats_match_numpy_exactly(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    n, s, g = gram_sufficient_stats(e, "embedding", dim=64)

    X = np.array([r["embedding"] for r in e.select("embedding").collect()])
    Q = np.floor(X.astype(np.float64) * QUANT).astype(np.int64)
    iu = np.triu_indices(64)
    assert n == len(Q)
    assert np.array_equal(s, Q.sum(axis=0))
    assert np.array_equal(g, (Q.T @ Q)[iu])


def test_gram_stats_invariant_under_repartition(spark, sf_dir):
    """Integer accumulation ⇒ identical stats whatever the partitioning
    (a float pipeline would drift in the last ulp here)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = gram_sufficient_stats(e, "embedding", dim=64)
    b = gram_sufficient_stats(e.repartition(13, "vec_id"), "embedding", dim=64)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(a[2], b[2])


def test_pca_spectrum_properties(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    rows = pca_variance_rows(e, "embedding", dim=64, top=8)
    assert [r[0] for r in rows] == list(range(8))
    eigs = [r[1] for r in rows]
    assert eigs == sorted(eigs, reverse=True)
    shares = [r[2] for r in rows]
    assert all(0 <= s <= 10000 for s in shares)
    assert rows[-1][3] == sum(shares)  # cum column is the running sum
    assert rows == pca_variance_rows(e, "embedding", dim=64, top=8)  # deterministic


def test_pca_recovers_planted_component(spark):
    """A rank-1 direction planted in noise must dominate the spectrum."""
    rng = np.random.RandomState(7)
    base = rng.normal(0, 0.01, size=(200, 64))
    direction = rng.normal(0, 1, size=64)
    direction /= np.linalg.norm(direction)
    coef = rng.normal(0, 1, size=(200, 1))
    X = base + coef * direction
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    rows = pca_variance_rows(df, "embedding", dim=64, top=3)
    assert rows[0][2] > 8000  # first component holds >80% of variance


def test_pca_no_int64_overflow_on_large_components(spark):
    """Regression (round-2 advisor): the rank-1 correction n·G − s sᵀ used
    np.outer in int64; with component magnitudes ~1e3 the quantized sums
    reach ~n·1e7 and the outer product overflows int64 already at
    n = 1000 rows.  The object-dtype (Python-int) assembly must agree
    with a plain float64 numpy covariance on the quantized data."""
    rng = np.random.RandomState(11)
    dim, n = 8, 1000
    X = rng.normal(1000.0, 50.0, size=(n, dim))  # large offset: big s
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    rows = pca_variance_rows(df, "embedding", dim=dim, top=dim)

    Q = np.floor(X * QUANT)  # float64 twin of the quantized data
    C = n * (Q.T @ Q) - np.outer(Q.sum(axis=0), Q.sum(axis=0))
    w = np.linalg.eigvalsh(C)[::-1]
    total = w.sum()
    # Old int64 path produced garbage negative entries here; shares from
    # the fixed path must match the float twin to the basis point.
    got_shares = [r[2] for r in rows]
    want_shares = [int(np.floor(10000.0 * wi / total)) for wi in w]
    assert got_shares == want_shares
    assert all(0 <= s_ <= 10000 for s_ in got_shares)
