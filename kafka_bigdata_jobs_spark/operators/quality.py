"""Corpus-quality operators for training-data curation: repetition
filters (Gopher-style), benchmark decontamination, and BPE merge-pair
statistics.

All hot paths are expression-compiled (whole-stage codegen); the only
shuffles are the per-document / per-token aggregations themselves, and
every per-doc constant rides the groupBy keys so no join-back is needed.
Each operator has an exact ANSI-SQL twin in the oracle suite.

The reference corpus analytics stop at per-tweet token/hashtag counts
(`/root/reference/batch/job4_spam.py:98-105`); these operators are the
beyond-reference additions a 100 TB pretraining pipeline runs on every
document shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def ngrams_zip(words: Column, n: int) -> Column:
    """Space-joined word n-grams (duplicates preserved) via a
    ``zip_with`` chain over shifted ``slice`` views.

    Deliberately NOT ``transform(sequence(0, size-n), i ->
    element_at(words, i+1) ...)``: higher-order lambdas evaluate
    interpreted, and projection collapsing inlines the ``split`` into
    every ``element_at`` reference — re-splitting the text O(n·k)
    times per row (measured 10x slower at sf0.1).  ``zip_with``
    evaluates each child array ONCE per row and streams the pair walk.
    Docs shorter than ``n`` yield an empty array (slice length clamps
    at 0), never a descending-sequence garbage gram.
    """
    length = F.greatest(F.size(words) - (n - 1), F.lit(0))
    acc = F.slice(words, 1, length)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(words, j, length),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return acc


def word_bigrams_all(text: Column) -> Column:
    """ALL word bigrams, duplicates preserved (repetition analysis needs
    multiplicity, unlike dedup shingling's ``array_distinct``)."""
    return ngrams_zip(_words(text), 2)


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str | None = None,
    carry: list[str] | None = None,
    words: Column | None = None,
) -> DataFrame:
    """Per-document repetition statistics: word counts, distinct-word
    counts, bigram totals, and the count of the most frequent bigram.

    Word-level stats are pure array expressions (zero shuffle); the
    top-bigram count needs per-(doc, bigram) multiplicity, so bigrams
    are exploded and aggregated twice on ``id_col`` — the per-doc
    constants ride the grouping keys, so there is no join-back.  Both
    shuffles hash on the document id; partial aggregation collapses
    each doc's bigrams map-side, so reducer input is O(distinct bigrams
    per doc), not O(words).

    Documents with fewer than two words produce no bigram rows and drop
    out (callers on corpora with possible one-word docs should pre-filter
    or union them back; the oracle's ``unnest`` has identical semantics).

    Pass ``words`` (a pre-split ``array<string>`` column, e.g. from the
    shared ``textproj.tokenized_documents`` projection) to skip the
    per-call regex split; otherwise ``text_col`` is split here.
    """
    carry = carry or []
    w = words if words is not None else _words(F.col(text_col))
    base = df.select(
        id_col,
        *carry,
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.explode(ngrams_zip(w, 2)).alias("bigram"),
    )
    per_gram = base.groupBy(
        id_col, *carry, "n_words", "n_distinct_words", "bigram"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy(id_col, *carry, "n_words", "n_distinct_words").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_bigram_count"),
    )


def word_ngrams_distinct(text: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) — decontamination unit."""
    return F.array_distinct(ngrams_zip(_words(text), n))


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str | None = None,
    n: int = 5,
    words_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: for each training document, how many
    of its distinct word ``n``-grams also occur anywhere in the
    benchmark set.

    Returns ``(id_col, shared_grams)`` for contaminated docs only.
    The benchmark gram set is deduplicated then broadcast — benchmark
    suites are tiny next to a 100 TB training corpus, so the join is
    map-side with no shuffle on the big side.  If the benchmark side
    ever outgrows broadcast range, drop the hint and Spark falls back
    to a hash-partitioned equi-join on the gram.  ``words_col`` (a
    pre-split array column present on BOTH inputs, e.g. textproj)
    skips the per-call regex split.
    """
    if words_col is not None:
        grams = F.array_distinct(ngrams_zip(F.col(words_col), n))
    else:
        grams = word_ngrams_distinct(F.col(text_col), n)
    t = train.select(F.col(id_col), F.explode(grams).alias("gram"))
    b = bench.select(F.explode(grams).alias("gram")).distinct()
    return (
        t.join(F.broadcast(b), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )


def char_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies within words —
    the statistic behind a BPE tokenizer's first merge choice.

    Double explode (words, then pairs) fans out to O(chars) rows, but
    the pair key domain is tiny (alphabet²), so map-side partial
    aggregation collapses each task's output to a few hundred rows
    before the single shuffle.
    """
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, char_length(w)-1), i -> substring(w, i, 2))")
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def word_frequencies(
    df: DataFrame, text_col: str | None = None, words: Column | None = None
) -> DataFrame:
    """Corpus-wide word frequencies: ``(word, cnt)`` — vocabulary
    construction input.  One shuffle on the word; partial aggregation
    bounds it by vocabulary size per task.  ``words`` (pre-split array,
    e.g. textproj) skips the per-call regex split."""
    w = words if words is not None else _words(F.col(text_col))
    return (
        df.select(F.explode(w).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
