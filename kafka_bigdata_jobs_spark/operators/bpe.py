"""Corpus-level BPE tokenizer training (Sennrich et al. 2016, public
method — the subword-vocabulary step every LLM data pipeline runs
before tokenizing).

Scale design
------------

BPE trains on the DISTINCT-WORD relation, not the corpus: Zipf's law
compresses trillions of running tokens into millions of word types, so
the state each merge iteration updates is (word, count, segmentation)
— bounded by the type vocabulary, shuffled nowhere after its one
groupBy.  Each of the ``n_merges`` iterations is:

1. one distributed aggregation: explode each word's adjacent
   segment pairs weighted by the word count, sum per pair (map-side
   combinable — the pair key space is bounded by vocab²),
2. one bounded driver action: take the argmax pair (a single row —
   limit(1) then collect),
3. one Arrow-batched map: rewrite segmentations, merging
   non-overlapping occurrences left-to-right (the overlap rule that
   makes 'aaa' + (a,a) -> [aa, a], matching reference BPE).

Lineage is cut with ``localCheckpoint`` each round (same discipline as
``graph.pagerank_bp``).  The merge table output is exact and
deterministic: ties in pair weight break on (left, right) text order.
Verified in tests/test_bpe.py against an independent pure-Python
reference implementation — exact merge-for-merge equality — since SQL
cannot express the iterative argmax (rows-only territory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """``(word, n)`` type-frequency relation: one explode + one groupBy
    (the only pass that ever touches the full corpus)."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")).alias(
                "word"
            )
        )
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_segs(segs: list[str], left: str, right: str) -> list[str]:
    """Merge non-overlapping (left, right) occurrences, left to right."""
    out: list[str] = []
    i = 0
    while i < len(segs):
        if i + 1 < len(segs) and segs[i] == left and segs[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(segs[i])
            i += 1
    return out


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_pair_weight: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, pair_weight), ...]`` (exact integers,
    deterministic tie-break weight DESC then (left, right) ASC).

    Stops early when the best pair's weight drops below
    ``min_pair_weight`` (merging hapax pairs memorizes noise).
    """
    import pandas as pd

    words = word_counts(df, text_col)
    state = words.select(
        "n", F.split(F.col("word"), "").alias("segs")
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            state.select(
                "n",
                F.explode(
                    F.expr(
                        "transform(slice(segs, 1, size(segs) - 1), "
                        "(s, i) -> struct(s as l, segs[i + 1] as r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("w"))
        )
        top = (
            pairs.orderBy(F.desc("w"), F.col("l"), F.col("r"))
            .limit(1)
            .collect()  # bounded: exactly one row
        )
        if not top or top[0]["w"] < min_pair_weight:
            break
        left, right, weight = top[0]["l"], top[0]["r"], int(top[0]["w"])
        merges.append((rank, left, right, weight))

        def rewrite(batches, _l=left, _r=right):
            for pdf in batches:
                pdf["segs"] = [
                    _merge_segs(list(s), _l, _r) for s in pdf["segs"]
                ]
                yield pd.DataFrame({"n": pdf["n"], "segs": pdf["segs"]})

        state = state.mapInPandas(
            rewrite, "n long, segs array<string>"
        ).localCheckpoint(eager=False)
    return merges


def bpe_tokenize_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Apply a trained merge table to the corpus — the deploy half of
    the tokenizer lifecycle (train on the type vocabulary once, then
    tokenize every document with the frozen artifact).

    One Arrow-batched map pass: the merge list rides the closure
    (KBs), nothing shuffles.  Each document's words re-run the merges
    IN TRAINING ORDER (BPE application is order-sensitive), then the
    per-document census is ``(doc, n_chars, n_words, n_tokens)`` —
    n_tokens/n_chars is the compression the vocabulary achieves, the
    number a tokenizer-budget plan needs per corpus slice.
    """
    import pandas as pd
    import re as _re

    ordered = [(left, right) for _, left, right, _ in sorted(merges)]

    def census(batches):
        for pdf in batches:
            ids, n_chars, n_words, n_tokens = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in _re.split(r"[^a-z0-9]+", text.strip().lower()) if w]
                toks = 0
                for w in words:
                    segs = list(w)
                    for left, right in ordered:
                        segs = _merge_segs(segs, left, right)
                    toks += len(segs)
                ids.append(doc_id)
                n_chars.append(sum(len(w) for w in words))
                n_words.append(len(words))
                n_tokens.append(toks)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_chars": n_chars,
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        census, f"{id_col} long, n_chars long, n_words long, n_tokens long"
    )
