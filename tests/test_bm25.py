"""BM25 + RRF: pure-Python twin, margin safety, and retrieval signal.

Same three-pin discipline as tests/test_dsir.py: (1) the operator's
integer scores equal an independent math replay on synthetic docs;
(2) the micro-nat IDF quantization sits far from every rounding
boundary on the suite fixture's query terms, so the ≤2-ulp
cross-engine ``ln`` divergence cannot flip a score; (3) the scoring
actually retrieves — a document stuffed with the query terms outranks
one that merely mentions them, and longer documents are penalized at
equal tf (the length normalization b is live).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.bm25 import (
    _DEN_CONST,
    _DEN_R_X,
    _DEN_TF_X,
    _NUM_X,
    LOG_SCALE,
    bm25_scores,
    rrf_fuse,
)

SF_ORACLE = "/root/testdata/sf0.01"
SUITE_TERMS = ["spark", "vector", "hash"]  # the suite query's fixed probe


def _py_bm25(docs: list[tuple[int, list[str]]], terms: list[str]):
    n = len(docs)
    d = sum(len(w) for _, w in docs)
    df = {t: sum(1 for _, w in docs if t in w) for t in terms}
    idf = {
        t: round(LOG_SCALE * math.log((2 * n + 2) / (2 * df[t] + 1)))
        for t in terms
        if df[t] > 0
    }
    out: dict[int, tuple[int, int]] = {}
    for doc_id, w in docs:
        r = (1000 * len(w) * n) // d
        s, nt = 0, 0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            nt += 1
            s += (idf[t] * _NUM_X * tf) // (_DEN_TF_X * tf + _DEN_CONST + _DEN_R_X * r)
        if nt:
            out[doc_id] = (nt, s)
    return out


def test_scores_match_python_replay(spark):
    docs = [
        (1, "spark spark spark hash join scan".split()),
        (2, "vector hash spark".split()),
        (3, "the slow table scan merge sort".split()),  # no hit → no row
        (4, "spark " * 50 + "filler " * 200),  # long doc, length-normalized
        (5, ["hash"]),
    ]
    docs = [(i, w if isinstance(w, list) else w.split()) for i, w in docs]
    df = spark.createDataFrame(docs, "doc_id: long, words: array<string>")
    got = {
        r.doc_id: (r.n_terms_hit, r.score_micro)
        for r in bm25_scores(df, SUITE_TERMS).collect()
    }
    assert got == _py_bm25(docs, SUITE_TERMS)
    assert 3 not in got


def test_length_normalization_is_live(spark):
    # same tf for 'spark', one doc padded 10x longer → strictly lower score
    docs = [
        (1, "spark spark data data".split()),
        (2, ("spark spark " + "pad " * 38).split()),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, words: array<string>")
    got = {r.doc_id: r.score_micro for r in bm25_scores(df, ["spark"]).collect()}
    assert got[1] > got[2] > 0


def test_fixture_idf_clears_rounding_boundaries():
    """The suite query's IDF values at sf0.01 must sit ≥1e-3 from the
    nearest .5 micro-nat boundary (worst cross-engine ln divergence is
    ~5e-9 at this magnitude)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    rows = con.execute(
        r"""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
          FROM documents
        ), hit AS (
          SELECT u.word AS term, COUNT(DISTINCT doc_id) AS df
          FROM w, unnest(words) AS u(word)
          WHERE u.word IN ('spark', 'vector', 'hash')
          GROUP BY u.word
        )
        SELECT term, df, (SELECT COUNT(*) FROM documents) AS n FROM hit
        """
    ).fetchall()
    assert len(rows) == len(SUITE_TERMS)
    for term, df_t, n in rows:
        v = LOG_SCALE * math.log((2 * n + 2) / (2 * df_t + 1))
        frac = abs(v - round(v))
        assert abs(0.5 - frac) > 1e-3, (term, df_t, v)


def test_rrf_fuse_matches_python_replay(spark):
    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id: long, rank: long"
    )
    b = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], "doc_id: long, rank: long"
    )
    got = {
        r.doc_id: (r.n_lists, r.rrf_micro)
        for r in rrf_fuse(a, b, k=60).collect()
    }
    expect: dict[int, tuple[int, int]] = {}
    for ranks in ({10: 1, 11: 2, 12: 3}, {11: 1, 13: 2, 10: 3}):
        for d, r in ranks.items():
            n, s = expect.get(d, (0, 0))
            expect[d] = (n + 1, s + LOG_SCALE // (60 + r))
    assert got == expect
    # doc in both lists beats single-list docs at comparable ranks
    assert got[11][1] > got[13][1] and got[10][1] > got[12][1]
