"""Okapi BM25 retrieval scoring, integer-exact on a quantized lattice.

The retrieval op a training-data pipeline runs constantly: "find the
documents most relevant to these terms" — for targeted corpus curation,
benchmark-neighborhood analysis, and as the sparse half of hybrid
(lexical + embedding) search.  The reference has no retrieval surface;
this module extends the existing inverted-index / TF-IDF family
(`suite.py::term_posting_lists`, `tfidf_top_terms`) with the scoring
function everybody actually deploys.

Public formula (Robertson & Walker; the Lucene variant to keep IDF
positive)::

    score(D, Q) = Σ_{t∈Q} idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5)) = ln((2N+2)/(2·df+1))

Cross-engine exactness (same discipline as :mod:`dsir`): true doubles
don't value-hash across engines, so the score is carried on an integer
lattice both engines can reproduce bit-for-bit:

- ``idf_mn(t) = round(1e6 · ln((2N+2)/(2·df+1)))`` — integer
  micro-nats of an integer ratio; both engines evaluate the same double
  ``ln`` and can disagree only within ~2 ulp, so a divergence requires
  the true value to sit within ~5e-15 of a .5e-6 rounding boundary
  (tests assert the fixture margins; see tests/test_bm25.py).
- ``dl/avgdl`` is quantized once per doc: ``R = (1000·dl·N) div D``
  where ``D = Σ dl`` (corpus word count) — the per-mille length ratio.
- with k1 = 1.2 and b = 0.75 folded through ×20000::

    contrib(t, D) = (idf_mn · 44000 · tf) div (20000·tf + 6000 + 18·R)

  (numerator: tf·(k1+1)·20000 = 44000·tf; denominator: 20000·tf +
  20000·k1·(1−b) + 20·k1·b·1000·(dl·N div D·1000→R)·... all integer).
  ``score_micro = Σ_t contrib`` — an exact BIGINT.

Overflow envelope: ``idf_mn ≤ 1e6·ln(2N+2)`` (≈ 2.4e7 at N = 1e10
docs) and the numerator ``idf_mn · 44000 · tf`` stays inside int64 for
``tf ≤ 8e6`` occurrences of one term in one document — far past any
real document.  ``r_permille``'s ``1000·dl·N`` term is computed in
BIGINT (``dl`` is cast up from ``F.size``'s int32 before the multiply,
ADVICE r3) and stays inside int64 for ``dl·N ≤ 9.2e15`` — e.g. a 1e10-doc
corpus with every document under 9e5 words.  Documented, not silent.

Scale design: one corpus-sized explode/agg builds (doc, term, tf) for
the probe terms ONLY (the `array_contains`-style prefilter keeps the
exploded relation tiny when |Q| ≪ vocab); df and the corpus constants
(N, D) are a |Q|-row + 1-row broadcast; scoring is a broadcast join +
sum — the corpus shuffles once on doc_id.  Top-k composes with
``relational.top_k`` (TakeOrderedAndProject, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: k1 = 1.2, b = 0.75 folded onto the x20000 integer lattice (see module
#: docstring).  Changing the free parameters means re-deriving these.
_NUM_X = 44000  # tf multiplier in the numerator: (k1+1) * 20000
_DEN_TF_X = 20000  # tf multiplier in the denominator
_DEN_CONST = 6000  # k1 * (1-b) * 20000
_DEN_R_X = 18  # k1 * b * 20000 / 1000  (applied to the per-mille ratio R)

LOG_SCALE = 1_000_000  # micro-nats, matching operators/dsir.py


def bm25_scores(
    tokenized: DataFrame,
    query_terms: Sequence[str],
    doc_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """Score every document of ``tokenized`` (a relation with a
    ``words array<string>`` column, e.g. textproj.tokenized_documents)
    against ``query_terms`` → ``(doc_id, n_terms_hit, score_micro)``.

    Documents containing none of the terms are omitted (score 0 —
    retrieval never materializes the non-matching corpus).
    """
    terms = [str(t) for t in query_terms]
    dl = F.size(F.col(words_col))

    docs = tokenized.select(
        F.col(doc_col).alias("doc_id"), dl.alias("dl"), F.col(words_col).alias("__w")
    )

    # Corpus constants: one tiny agg, broadcast into every expression.
    const = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_words")
    )

    # (doc, term, tf) for probe terms only: filter BEFORE exploding so the
    # shuffled relation is ≤ |Q| rows per matching doc, not corpus×dl.
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = (
        docs.where(F.arrays_overlap(F.col("__w"), term_arr))
        .select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("__w"), lambda x: F.array_contains(term_arr, x))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # Document frequency per probe term: |Q| rows, broadcast.
    df_t = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    scored = (
        hits.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(const))
        .select(
            "doc_id",
            "term",
            F.round(
                F.lit(float(LOG_SCALE))
                * F.log(
                    (2 * F.col("n_docs") + 2).cast("double")
                    / (2 * F.col("df") + 1).cast("double")
                )
            )
            .cast("long")
            .alias("idf_mn"),
            F.col("tf").cast("long").alias("tf"),
            # dl comes from F.size (int32); cast BEFORE the multiply so
            # 1000·dl can't wrap for documents beyond ~2.1M words
            # (non-ANSI Spark would wrap silently; DuckDB would error —
            # a cross-engine parity break, ADVICE r3).
            F.expr(
                "(1000 * cast(dl as bigint) * n_docs) div total_words"
            ).alias("r_permille"),
        )
        .select(
            "doc_id",
            "term",
            F.expr(
                f"(idf_mn * {_NUM_X} * tf) div "
                f"({_DEN_TF_X} * tf + {_DEN_CONST} + {_DEN_R_X} * r_permille)"
            ).alias("contrib_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.sum("contrib_micro").cast("long").alias("score_micro"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists (public
    hybrid-retrieval standard, Cormack et al. SIGIR'09)::

        rrf(d) = Σ_lists 1 / (k + rank_d)

    quantized to ``rrf_micro = Σ 1000000 div (k + rank)`` so the fused
    score is integer-exact.  Inputs carry (doc_col, rank_col); a doc
    absent from a list contributes nothing for it (the standard
    convention).  Both lists are top-k relations — tiny — so this is
    broadcast-sized algebra; output: (doc_id, n_lists, rrf_micro).
    """
    score = F.expr(f"{LOG_SCALE} div ({k} + {rank_col})")
    tagged = ranked_a.select(
        F.col(doc_col).alias("doc_id"), score.alias("s")
    ).unionByName(ranked_b.select(F.col(doc_col).alias("doc_id"), score.alias("s")))
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("s").cast("long").alias("rrf_micro"),
    )
