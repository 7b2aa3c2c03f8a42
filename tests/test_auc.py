"""auc_rank_sum vs the O(n^2) pair-counting definition of AUC.

AUC = P(score_pos > score_neg) + 0.5 * P(score_pos == score_neg); the
operator computes 2x that numerator via a distinct-score cumulative
sum, so brute-force pair counting over small seeded datasets is an
exact (integer) twin — ties, separability extremes, and constant
scores included.
"""

from __future__ import annotations

import random

from kafka_bigdata_jobs_spark.operators.stats import auc_rank_sum


def _brute_num2(rows):
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return len(pos), len(neg), num2


def _run(spark, rows):
    df = spark.createDataFrame(rows, "score: long, y: long")
    r = auc_rank_sum(df, "score", "y").collect()[0]
    return r.n_pos, r.n_neg, r.auc_num2, r.auc_bp


def test_perfect_separation(spark):
    rows = [(10, 1)] * 3 + [(1, 0)] * 4
    assert _run(spark, rows) == (3, 4, 24, 10000)


def test_perfect_inversion(spark):
    rows = [(1, 1)] * 3 + [(10, 0)] * 4
    assert _run(spark, rows) == (3, 4, 0, 0)


def test_constant_score_is_half(spark):
    rows = [(5, 1)] * 6 + [(5, 0)] * 4
    n_pos, n_neg, num2, bp = _run(spark, rows)
    assert (num2, bp) == (n_pos * n_neg, 5000)


def test_fuzz_vs_pair_counting(spark):
    rng = random.Random(99)
    for trial in range(4):
        rows = [
            (rng.randrange(8), rng.randrange(2))
            for _ in range(rng.randrange(30, 120))
        ]
        if not any(y for _, y in rows):
            rows.append((3, 1))
        if all(y for _, y in rows):
            rows.append((3, 0))
        n_pos, n_neg, num2 = _brute_num2(rows)
        got = _run(spark, rows)
        assert got == (
            n_pos,
            n_neg,
            num2,
            (10000 * num2) // (2 * n_pos * n_neg),
        ), f"trial {trial}"


def test_pr_curve_vs_brute_force(spark):
    from kafka_bigdata_jobs_spark.operators.stats import pr_curve

    rng = random.Random(5)
    rows = [(rng.randrange(6), rng.randrange(2)) for _ in range(80)] + [(2, 1)]
    n_pos = sum(y for _, y in rows)
    df = spark.createDataFrame(rows, "score: long, y: long")
    got = {r.threshold: r for r in pr_curve(df, "score", "y").collect()}
    assert set(got) == {s for s, _ in rows}
    for t, r in got.items():
        pred = [(s, y) for s, y in rows if s >= t]
        tp = sum(y for _, y in pred)
        assert (r.n_pred_pos, r.tp) == (len(pred), tp), t
        p_bp = (10000 * tp) // len(pred)
        r_bp = (10000 * tp) // max(n_pos, 1)
        assert (r.precision_bp, r.recall_bp) == (p_bp, r_bp), t
        assert r.f1_bp == (2 * p_bp * r_bp) // max(p_bp + r_bp, 1), t
