"""Training-data pipeline operators: chunking, splits, sampling, scrubbing.

These are the corpus-preparation steps a 100 TB pretraining pipeline
runs between raw ingest and tokenization.  All are expression-only
(whole-stage codegen, no Python workers) and embarrassingly parallel:
no operator here shuffles except where the semantics require a
cross-document aggregate (document frequency in
:func:`distinctive_terms`).

Determinism contract: anything that "randomly" samples or splits keys
off an md5 content/id hash, never ``rand()`` — reruns, retries, and the
DuckDB oracle all see identical assignments, and new data never
reshuffles old rows between splits (the property hash-splitting exists
for).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks.

    One row per (doc, chunk): ``chunk_id`` counts from 0, chunk ``i``
    covers ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``.  The final chunk may be short;
    every character belongs to ≥1 chunk.  ``explode(sequence(...))`` +
    ``substr`` stays in whole-stage codegen and never materializes a
    per-document array of chunk strings.

    SQL twin (DuckDB): ``unnest(range((length(text)-1)//stride + 1))``
    + the same 1-based ``substr``.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    t = F.col(text_col)
    n_chunks = F.floor((F.length(t) - 1) / stride) + 1
    exploded = df.select(
        F.col(id_col),
        t.alias("__t"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    chunk = F.col("__t").substr(
        (F.col("chunk_id") * stride + 1).cast("int"), F.lit(chunk_size)
    )
    return exploded.select(
        id_col,
        "chunk_id",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from the md5 of the key.

    ``conv(substr(md5(key), 1, 4), 16, 10) % n`` — the first 16 bits of
    the md5, identical in any engine that can hash a string (DuckDB
    twin: ``CAST('0x' || substr(md5(key),1,4) AS INTEGER) % n``).
    16 bits give 65536 raw buckets, plenty of resolution for split
    fractions down to ~0.1%.
    """
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % n_buckets


def assign_split(
    df: DataFrame,
    key_col: str,
    split_col: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash.

    Hash-based (not ``rand()``-based) so the assignment is stable
    across reruns and growing corpora: a document's split is a pure
    function of its key, so appending new data never moves old rows
    between splits (which would leak val into train).
    """
    b = hash_bucket(F.col(key_col).cast("string"))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fraction_pct: int,
    strata: Sequence[str] = (),
) -> DataFrame:
    """Deterministic ~``fraction_pct``% sample, uniform within strata.

    The hash key is salted with the strata values so the same document
    id draws independently in different strata contexts; filtering is a
    pure per-row predicate — no shuffle, no state, reproducible.
    (Exact per-stratum counts need a rank-based variant; hash sampling
    is the scale path — single pass, mergeable, append-stable.)
    """
    salted = F.concat_ws("|", F.col(key_col).cast("string"), *[F.col(s) for s in strata])
    return df.where(hash_bucket(salted) < fraction_pct)


# PII patterns deliberately simple + portable (Java regex and RE2-style
# engines agree on this subset: no backrefs, no lookaround).
_PII_PATTERNS: list[tuple[str, str, str]] = [
    # order matters: the most specific shape first — the general phone
    # pattern would otherwise consume SSN-shaped digit groups
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str, out_col: str | None = None, count_col: str | None = None
) -> DataFrame:
    """Redact email/phone/SSN-shaped substrings with typed placeholders.

    Chained ``regexp_replace`` — one codegen'd pass per pattern, no
    Python.  With ``count_col``, also emits how many redactions were
    made (sum of per-pattern ``regexp_count`` BEFORE replacement, so
    overlapping patterns count against the text they actually matched).
    """
    out_col = out_col or text_col
    scrubbed = F.col(text_col)
    counts: Column = F.lit(0)
    for _, pat, repl in _PII_PATTERNS:
        counts = counts + F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out = df.withColumn(out_col, scrubbed)
    if count_col:
        out = out.withColumn(count_col, counts)
    return out


def distinctive_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k most distinctive terms per document, tf-idf ordered.

    Rank = term frequency DESC, document frequency ASC, term ASC — the
    tf-idf ordering without computing ``ln(N/df)``: for fixed tf the
    score is monotone decreasing in df, so the integer sort is the same
    ranking with no cross-engine floating-log hazard.  Two shuffles:
    (doc, term) counts, then term → document frequency, joined back and
    windowed per doc.
    """
    from pyspark.sql.window import Window

    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def sample_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    the md5 of their id and keep the first k.

    This is the distributed, rerun-stable replacement for per-group
    reservoir sampling: the hash order is uniform-pseudorandom but a
    pure function of the row id, so retries, backfills, and the DuckDB
    oracle all select the identical rows (``rand()`` would not survive
    any of those).  One shuffle (the window partition); at 100 TB the
    rank-truncation happens inside each partition, never on the driver.
    The id itself breaks md5-collision ties.
    """
    from pyspark.sql.window import Window

    hash_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(hash_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_greedy_bins(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Sequence packing for pretraining batches: assign each document a
    bin id so consecutive documents fill a token/char ``budget``.

    bin = (running size BEFORE this row) DIV budget, over a
    deterministic order within each partition — the streaming-friendly
    "contiguous fill" approximation of bin packing (true bin packing is
    NP-hard and needs global state; contiguous fill is one window
    cumsum, scales linearly, and wastes at most one document's worth of
    slack per boundary).  A document larger than the budget simply
    spans bins — its successor starts a fresh bin automatically because
    the cumsum jumps past the boundary.  All-integer, so bin ids are
    engine-exact and oracle-checkable.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    # floor(double div) matches integer DIV exactly while the running
    # sum stays far below 2^53 / budget — quotients can't land within
    # one ulp of an integer boundary; repartition the corpus before
    # any single partition's char count approaches that.
    return df.withColumn(bin_col, F.floor(before / budget).cast("long"))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_pct: Column,
    strata: Sequence[str] = (),
) -> DataFrame:
    """Importance-weighted deterministic sampling: each row's inclusion
    probability is its own ``weight_pct`` (0–100) — the dataset-mixing /
    domain-reweighting primitive (upsample scarce domains, downsample
    over-represented ones) behind training-corpus composition.

    Same hash-threshold machinery as :func:`stratified_sample` but the
    threshold is per-row data instead of a constant: include iff
    ``hash_bucket(key) < weight_pct``.  Still a pure per-row predicate:
    single pass, no shuffle, append-stable, and exactly reproducible in
    any engine that computes the same md5 bucket.
    """
    salted = F.concat_ws(
        "|", F.col(key_col).cast("string"), *[F.col(s) for s in strata]
    )
    return df.where(hash_bucket(salted) < weight_pct)
