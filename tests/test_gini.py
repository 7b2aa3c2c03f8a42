"""Gini formula sanity on hand-built distributions (the suite query
nation_revenue_gini is oracle-gated; this pins the closed form)."""

from __future__ import annotations


def _gini_bp(values: list[int]) -> int:
    xs = sorted(values)
    n, tot = len(xs), sum(xs)
    num = sum(2 * i * x for i, x in enumerate(xs, start=1)) - (n + 1) * tot
    return (10000 * num) // (n * tot)


def test_equal_distribution_is_zero():
    assert _gini_bp([5, 5, 5, 5]) == 0


def test_total_concentration_approaches_one():
    # one customer holds everything: G = (n-1)/n
    assert _gini_bp([0, 0, 0, 100]) == 7500


def test_tie_order_cannot_change_result():
    # permuting equal values leaves sum(i*x) unchanged per tied block
    assert _gini_bp([3, 3, 9]) == _gini_bp([3, 9, 3])


def test_spark_matches_formula(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    data = [(1, 10), (1, 10), (1, 40), (2, 7), (2, 7), (2, 7)]
    df = spark.createDataFrame(data, "k: long, x: long")
    w = Window.partitionBy("k").orderBy("x")
    wn = Window.partitionBy("k")
    ranked = df.select(
        "k",
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("x").over(wn).alias("tot"),
    )
    g = {
        r.k: r.gini_bp
        for r in ranked.groupBy("k")
        .agg(
            F.expr(
                "(10000 * (sum(2*i*x) - (max(n)+1)*max(tot))) "
                "div (max(n)*max(tot))"
            ).alias("gini_bp")
        )
        .collect()
    }
    assert g == {1: _gini_bp([10, 10, 40]), 2: _gini_bp([7, 7, 7])}
    assert g[2] == 0
