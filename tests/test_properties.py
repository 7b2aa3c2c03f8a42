"""Property-based spot checks (SURVEY.md §5.4) with hypothesis.

Each property is an algebraic invariant the engine relies on at scale:
partition-invariance makes results reproducible regardless of cluster
parallelism; pivot row-sums tie the crosstab to its marginal; hash
splits must be append-stable or validation data leaks into training.
Few examples per property (Spark jobs are seconds each), broad value
ranges.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.relational import exact_sum, pivot_counts

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=50,
)


@given(vals=values, parts=st.integers(min_value=1, max_value=7))
@settings(**SETTINGS)
def test_exact_sum_partition_invariant(spark, vals, parts):
    """Integer-cents sums are associative+commutative exactly, so the
    answer cannot depend on how rows land across partitions (double
    summation would differ in the last bits per partitioning)."""
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    one = df.coalesce(1).agg(exact_sum("value").alias("s")).first()["s"]
    many = (
        df.repartition(parts).agg(exact_sum("value").alias("s")).first()["s"]
    )
    assert one == many


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_pivot_rowsums_equal_group_counts(spark, pairs):
    """The pivot crosstab's row-sum must equal the plain groupBy count —
    explicit pivot values may add zero columns but never lose rows."""
    df = spark.createDataFrame(pairs, "k int, cat string")
    piv = pivot_counts(df, ["k"], "cat", ["a", "b", "c"]).collect()
    want = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["k"]: sum(r[c] for c in ("a", "b", "c")) for r in piv}
    assert got == want


@given(ids=st.sets(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=60))
@settings(**SETTINGS)
def test_split_assignment_append_stable(spark, ids):
    """A key's train/val/test split is a pure function of the key:
    computing splits on a subset and on the full set must agree on the
    subset (no leakage when the corpus grows)."""
    from kafka_bigdata_jobs_spark.operators.pipeline import assign_split

    ids = sorted(ids)
    half = ids[: len(ids) // 2]
    full_df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    half_df = spark.createDataFrame([(i,) for i in half], "doc_id bigint")
    on_full = {
        r["doc_id"]: r["split"] for r in assign_split(full_df, "doc_id").collect()
    }
    on_half = {
        r["doc_id"]: r["split"] for r in assign_split(half_df, "doc_id").collect()
    }
    assert all(on_full[i] == on_half[i] for i in half)


@given(texts=st.lists(st.text(max_size=40), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_sentiment_classifies_every_row(spark, texts):
    """The 5-way sentiment ladder is total: every input row gets exactly
    one class, nulls included (reference job3 must never drop tweets)."""
    from kafka_bigdata_jobs_spark.operators.sentiment import with_sentiment

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = with_sentiment(df, "text").collect()
    assert len(rows) == len(texts)
    assert all(r["sentiment"] is not None for r in rows)


words_strategy = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=3), min_size=0, max_size=12
)


@given(words=words_strategy, n=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_ngrams_zip_matches_python_reference(spark, words, n):
    """zip_with n-gram chain == the obvious Python sliding window, for
    any word list and n (including docs shorter than n -> empty)."""
    from kafka_bigdata_jobs_spark.operators.quality import ngrams_zip

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        ngrams_zip(F.split(F.trim(F.col("text")), r"\s+"), n).alias("g")
    ).first()["g"]
    toks = text.strip().split() if text.strip() else [""]
    expected = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    assert got == expected


@given(words=st.lists(st.text(alphabet="abc", min_size=1, max_size=2), min_size=2, max_size=15))
@settings(**SETTINGS)
def test_repetition_stats_invariants(spark, words):
    """n_bigrams = n_words - 1; top bigram count bounded by total; the
    distinct count never exceeds the word count."""
    from kafka_bigdata_jobs_spark.operators.quality import repetition_stats

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    r = repetition_stats(df, "doc_id", "text").first()
    assert r["n_bigrams"] == r["n_words"] - 1
    assert 1 <= r["top_bigram_count"] <= r["n_bigrams"]
    assert r["n_distinct_words"] <= r["n_words"]


@given(
    heavy=st.integers(min_value=30, max_value=60),
    noise=st.integers(min_value=5, max_value=30),
)
@settings(**SETTINGS)
def test_freq_items_superset_of_true_heavy_hitters(spark, heavy, noise):
    """freqItems must return a SUPERSET of items with frequency >
    support — the sketch may over-report, never under-report."""
    rows = (
        [("hot",)] * heavy
        + [(f"n{i}",) for i in range(noise)]
        + [("warm",)] * heavy
    )
    df = spark.createDataFrame(rows, "k string")
    total = len(rows)
    support = 0.2
    got = set(df.stat.freqItems(["k"], support=support).first()[0])
    truth = {
        k for k, c in {"hot": heavy, "warm": heavy}.items() if c / total > support
    }
    assert truth <= got


@given(
    w_lo=st.integers(min_value=0, max_value=50),
    w_hi=st.integers(min_value=50, max_value=100),
)
@settings(**SETTINGS)
def test_weighted_sample_monotone_inclusion(spark, w_lo, w_hi):
    """Raising a row's weight can only ADD it to the sample, never drop
    it (hash-threshold semantics): sample(w_lo) ⊆ sample(w_hi)."""
    from kafka_bigdata_jobs_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id int")
    lo = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", F.lit(w_lo)).collect()
    }
    hi = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", F.lit(w_hi)).collect()
    }
    assert lo <= hi
