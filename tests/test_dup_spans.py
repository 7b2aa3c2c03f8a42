"""Cross-document duplicate-span operator (substring-grain dedup,
Lee et al. 2022 re-expressed relationally): spans are maximal runs of
consecutive word n-gram positions whose n-gram occurs in >= min_docs
distinct documents.  Ground truth is a brute-force pure-Python twin.
"""

from __future__ import annotations

import pytest

from kafka_bigdata_jobs_spark.operators.dedup import duplicate_span_rows


def _brute_spans(docs: dict[int, list[str]], n: int, min_docs: int):
    """Reference: dict id -> list of (span_start, span_len)."""
    grams: dict[int, list[str]] = {
        i: [" ".join(ws[p : p + n]) for p in range(max(len(ws) - n + 1, 0))]
        for i, ws in docs.items()
    }
    owners: dict[str, set[int]] = {}
    for i, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(i)
    spans: dict[int, list[tuple[int, int]]] = {}
    for i, gs in grams.items():
        marked = [p for p, g in enumerate(gs) if len(owners[g]) >= min_docs]
        runs, start, prev = [], None, None
        for p in marked:
            if start is None:
                start, prev = p, p
            elif p == prev + 1:
                prev = p
            else:
                runs.append((start, prev - start + 1))
                start, prev = p, p
        if start is not None:
            runs.append((start, prev - start + 1))
        if runs:
            spans[i] = runs
    return spans


def _collect(df):
    out: dict[int, list[tuple[int, int]]] = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_len"])
        )
    return {k: sorted(v) for k, v in out.items()}


WORDS = [f"w{i}" for i in range(40)]


@pytest.fixture()
def docs_df(spark):
    docs = {
        # A and B share words 10..24 (15 words -> 8 consecutive dup
        # 8-gram positions in each, merged into ONE span).
        1: WORDS[:25],
        2: WORDS[10:25] + ["x1", "x2", "x3", "x4", "x5"],
        # C shares a shorter run 10..19 with A and B (10 words -> 3
        # dup positions) plus its own unique tail.
        3: WORDS[10:20] + ["y1", "y2", "y3"],
        # D: unrelated words, no spans.
        4: [f"z{i}" for i in range(15)],
        # E: shorter than n, no positions at all.
        5: ["a", "b", "c"],
    }
    df = spark.createDataFrame(
        [(i, "en", ws) for i, ws in docs.items()],
        "doc_id long, lang string, words array<string>",
    )
    return docs, df


def test_matches_bruteforce_twin(docs_df):
    docs, df = docs_df
    got = _collect(duplicate_span_rows(df, "doc_id", "words", n=8))
    want = {k: sorted(v) for k, v in _brute_spans(docs, 8, 2).items()}
    assert got == want


def test_consecutive_positions_merge_into_one_span(docs_df):
    docs, df = docs_df
    got = _collect(duplicate_span_rows(df, "doc_id", "words", n=8))
    # Doc 2 starts AT the shared block: its 8 dup positions are 0..7.
    assert got[2] == [(0, 8)]
    # Doc 1's shared block starts at word 10 -> positions 10..17.
    assert got[1] == [(10, 8)]
    # Docs 4 (unique) and 5 (< n words) emit nothing.
    assert 4 not in got and 5 not in got


def test_min_docs_threshold(docs_df):
    docs, df = docs_df
    got3 = _collect(duplicate_span_rows(df, "doc_id", "words", n=8, min_docs=3))
    want3 = {k: sorted(v) for k, v in _brute_spans(docs, 8, 3).items()}
    assert got3 == want3
    # Words 10..19 are in all three docs: only the 3 positions whose
    # whole 8-gram sits inside that 10-word run survive min_docs=3.
    assert got3[3] == [(0, 3)]


def test_carry_columns_ride_through(docs_df):
    _docs, df = docs_df
    rows = duplicate_span_rows(
        df, "doc_id", "words", n=8, carry=("lang",)
    ).collect()
    assert rows and all(r["lang"] == "en" for r in rows)
    assert set(rows[0].asDict()) == {
        "doc_id", "lang", "span_start", "span_len",
    }


def test_gap_between_runs_yields_two_spans(spark):
    # Shared 8-gram blocks at positions 0..7 and 20..27 of doc 1, with
    # unique filler between: exactly two spans, not one.
    a = WORDS[:8] + [f"u{i}" for i in range(12)] + WORDS[8:16] + ["u99"]
    b = WORDS[:8] + ["v1"] + WORDS[8:16]
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, words array<string>"
    )
    got = _collect(duplicate_span_rows(df, "doc_id", "words", n=8))
    assert got[1] == [(0, 1), (20, 1)]
    assert got[2] == [(0, 1), (9, 1)]


def test_suite_queries_match_oracle(spark):
    from kafka_bigdata_jobs_spark import suite
    from tests.oracle_harness import compare, duckdb_conn

    sf = "/root/testdata/sf0.001"
    con = duckdb_conn(sf)
    for name in ("dup_span_profile", "dup_span_top_docs"):
        q = suite.registry()[name]
        assert compare(q.fn(spark, sf), con, q.oracle) == [], name
