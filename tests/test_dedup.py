"""Segment-grain containment: hand-built quote/subset twins.

(The symmetric near-dup funnels are covered in tests/test_dup_spans.py,
test_incremental.py, and the oracle suite; this file pins the
asymmetric containment operator added in round 3.)
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Segment-grain containment (asymmetric quote/subset detection)
# ---------------------------------------------------------------------------


def test_segment_containment_quote_shape(spark):
    from kafka_bigdata_jobs_spark.operators.dedup import (
        segment_containment_pairs,
    )

    # doc 1: two segments (A B) -- fully quoted inside doc 2 (A B C D),
    # at ALIGNED offsets.  doc 3 shares nothing.  Expected: 1 contained
    # in 2 at 100%; 2 contained in 1 at 50%; no rows involving 3.
    seg = lambda tag: [f"{tag}{i}" for i in range(20)]
    d1 = seg("a") + seg("b")
    d2 = seg("a") + seg("b") + seg("c") + seg("d")
    d3 = seg("z") + seg("y")
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id: long, words: array<string>"
    )
    got = {
        (r.id_a, r.id_b): (r.n_seg_a, r.shared_segments, r.containment_bp)
        for r in segment_containment_pairs(
            df, "doc_id", "words", seg_len=20, min_containment_bp=5000
        ).collect()
    }
    assert got == {(1, 2): (2, 2, 10000), (2, 1): (4, 2, 5000)}


def test_segment_containment_is_alignment_sensitive(spark):
    from kafka_bigdata_jobs_spark.operators.dedup import (
        segment_containment_pairs,
    )

    # the same 20 words shifted by one word inside the host: segments
    # no longer align, so the operator (documented) reports nothing —
    # the span-grain operator covers unaligned copies.
    quoted = [f"q{i}" for i in range(20)]
    host = ["pad"] + quoted + [f"h{i}" for i in range(19)]
    df = spark.createDataFrame(
        [(1, quoted), (2, host)], "doc_id: long, words: array<string>"
    )
    assert (
        segment_containment_pairs(
            df, "doc_id", "words", seg_len=20, min_containment_bp=1
        ).count()
        == 0
    )
