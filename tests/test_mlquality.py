"""Distilled quality classifier: agreement floor + scoring-path purity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.mlquality import (
    FEATURE_COLS,
    featurize,
    fit_quality_classifier,
    quality_filter_report,
    score_corpus,
)

SF = "/root/testdata/sf0.001"


def test_student_agrees_with_teacher(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = quality_filter_report(docs).collect()
    n = sum(r.n_docs for r in rep)
    agree = sum(r.n_agree for r in rep)
    assert n == docs.count()
    # The student is trained to mimic the teacher on these features;
    # anything under 90% agreement means the distillation regressed.
    assert agree / n >= 0.90, f"agreement {agree / n:.3f}"
    # Non-degenerate: the 90-threshold teacher splits the fixture corpus,
    # and the student must reproduce a split, not a constant.
    pred = sum(r.n_pred_good for r in rep)
    assert 0 < pred < n


def test_scoring_path_has_no_python_udf(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assembler, model = fit_quality_classifier(docs)
    scored = score_corpus(docs, assembler, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "student scoring must stay JVM-side"
    )


def test_features_are_deterministic_expressions(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = featurize(docs).select("doc_id", *FEATURE_COLS).collect()
    b = featurize(docs).select("doc_id", *FEATURE_COLS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
