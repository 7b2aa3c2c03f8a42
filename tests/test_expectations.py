"""Data-quality expectations: violation counting, single-pass plan."""

from __future__ import annotations

from kafka_bigdata_jobs_spark.operators import expectations as X


def _toy(spark):
    rows = [
        (1, "a", 10.0, 100),
        (2, "b", -5.0, 100),      # range violation
        (2, "c", 20.0, 200),      # duplicate id
        (3, None, 30.0, 999),     # null name, orphan ref
        (4, "zz", None, 100),     # null value -> range violation
    ]
    return spark.createDataFrame(rows, "id long, name string, v double, ref long")


def _dim(spark):
    return spark.createDataFrame([(100,), (200,)], "k long")


def test_quality_report_counts(spark):
    df = _toy(spark)
    rep = X.quality_report(
        df,
        row_checks=[
            X.not_null("name_not_null", "name"),
            X.in_range("v_in_range", "v", 0, 100),
            X.matches("name_lowercase", "name", "^[a-z]+$"),
        ],
        unique_keys={"id_unique": ["id"]},
        references=[("ref_valid", "ref", _dim(spark), "k")],
    )
    got = {r.check_name: (r.n_violations, r.passed) for r in rep.collect()}
    assert got == {
        "name_not_null": (1, False),
        "v_in_range": (2, False),      # -5 and NULL
        "name_lowercase": (1, False),  # NULL fails the regex check too
        "id_unique": (1, False),       # id=2 twice -> 1 extra row
        "ref_valid": (1, False),       # 999
    }


def test_row_checks_are_one_pass(spark):
    df = _toy(spark)
    rep = X.row_checks_report(
        df,
        [
            X.not_null("a", "name"),
            X.in_range("b", "v", 0, 100),
            X.in_set("c", "name", ["a", "b"]),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # One aggregate over one scan: however many checks, exactly one
    # LocalTableScan/Scan feeds one HashAggregate pair.
    assert plan.count("HashAggregate") <= 2


def test_all_green_on_clean_table(spark):
    df = _dim(spark)
    rep = X.quality_report(
        df,
        row_checks=[X.not_null("k_not_null", "k")],
        unique_keys={"k_unique": ["k"]},
    )
    assert all(r.passed for r in rep.collect())
