"""Distilled ML quality classifier — the trained-filter stage of a
pretraining data pipeline (CCNet / fastText-classifier analog; public
method: Wenzek et al. 2020, Brown et al. 2020 §A quality filtering).

The expensive teacher is the rule-based :func:`textstats.quality_score`
heuristic (in production: a slow LM-perplexity scorer or human labels);
the student is a logistic regression over CHEAP surface features that
are pure column expressions.  The pipeline shape matters more than the
model: label a bounded sample with the teacher, fit a tiny model on the
driver-coordinated sample, then score the WHOLE corpus with the fitted
model — a broadcast of ~10 doubles applied JVM-side (``ml.transform``
is no Python in the scoring path).

Scale design (100 TB):

- feature computation is expression-only — whole-stage codegen, no UDF;
- the teacher runs only on the fit sample (``fit_sample_rows`` cap, the
  same bounded-sample discipline as PQ/IVF codebook fitting);
- scoring is ``model.transform``: one map-side projection, no shuffle,
  no collect of corpus data — the model itself is the only thing that
  moves.

Deterministic enough for rows-only verification: the fit sample is
seeded, LBFGS on a fixed sample converges to the same optimum, and the
pin test asserts an agreement FLOOR vs the teacher (not exact hashes),
so last-ulp float drift cannot flake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import quality_score

#: Feature columns the student sees — surface statistics only, each a
#: single expression over the text column.
FEATURE_COLS = (
    "f_n_words",
    "f_mean_wlen_x10",
    "f_uniq_ratio_x100",
    "f_alpha_ratio_x100",
    "f_digit_ratio_x100",
    "f_n_chars",
)


def surface_features(text: Column) -> dict[str, Column]:
    """Cheap surface features as named expressions (all double-typed for
    the assembler; integer lattice ratios scaled x10/x100 like the rest
    of the suite)."""
    words = F.split(F.trim(text), r"\s+")
    n_words = F.when(F.trim(text) == "", 0).otherwise(F.size(words))
    length = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_distinct = F.size(F.array_distinct(words))
    safe_words = F.greatest(n_words, F.lit(1))
    safe_len = F.greatest(length, F.lit(1))
    return {
        "f_n_words": n_words.cast("double"),
        "f_mean_wlen_x10": (length * 10 / safe_words).cast("double"),
        "f_uniq_ratio_x100": (n_distinct * 100 / safe_words).cast("double"),
        "f_alpha_ratio_x100": (n_alpha * 100 / safe_len).cast("double"),
        "f_digit_ratio_x100": (n_digit * 100 / safe_len).cast("double"),
        "f_n_chars": length.cast("double"),
    }


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the surface-feature columns (expression-only projection)."""
    out = df
    for name, col in surface_features(F.col(text_col)).items():
        out = out.withColumn(name, col)
    return out


def fit_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    good_threshold: int = 90,
    fit_sample_rows: int = 20_000,
    seed: int = 7,
):
    """Fit the student on a seeded teacher-labeled sample.

    Returns ``(assembler, model)``; both are tiny broadcastable objects.
    The teacher (rule quality_score >= ``good_threshold``; the fixture
    corpus scores in {75, 90, 100}, so 90 splits it ~70/30) runs ONLY on
    the sample — at corpus scale the teacher may be arbitrarily slow
    (an LM scorer) without affecting the scoring pass.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    n = docs.count()
    sample = docs
    if n > fit_sample_rows:
        sample = docs.sample(
            fraction=min(1.0, 1.05 * fit_sample_rows / n), seed=seed
        )
    labeled = featurize(sample, text_col).withColumn(
        "label",
        (quality_score(F.col(text_col)) >= good_threshold).cast("double"),
    )
    assembler = VectorAssembler(
        inputCols=list(FEATURE_COLS), outputCol="features"
    )
    lr = LogisticRegression(
        maxIter=50, regParam=0.01, standardization=True, tol=1e-8
    )
    model = lr.fit(assembler.transform(labeled))
    return assembler, model


def score_corpus(
    docs: DataFrame,
    assembler,
    model,
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the fitted student: appends
    ``pred_good`` (0/1 long).  JVM-side transform — the corpus never
    leaves the executors and nothing shuffles."""
    scored = model.transform(assembler.transform(featurize(docs, text_col)))
    return scored.withColumn(
        "pred_good", F.col("prediction").cast("long")
    ).drop("features", "rawPrediction", "probability", "prediction")


def quality_filter_report(
    docs: DataFrame,
    text_col: str = "text",
    good_threshold: int = 90,
    fit_sample_rows: int = 20_000,
    seed: int = 7,
) -> DataFrame:
    """End-to-end distillation report per source: corpus size, student
    keep-count, teacher keep-count, and student/teacher agreement."""
    assembler, model = fit_quality_classifier(
        docs, text_col, good_threshold, fit_sample_rows, seed
    )
    scored = score_corpus(docs, assembler, model, text_col).withColumn(
        "rule_good",
        (quality_score(F.col(text_col)) >= good_threshold).cast("long"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pred_good").alias("n_pred_good"),
        F.sum("rule_good").alias("n_rule_good"),
        F.sum(
            (F.col("pred_good") == F.col("rule_good")).cast("long")
        ).alias("n_agree"),
    )
