"""Char-entropy feature: hand values, margins, and estimator bias.

Pins: (1) hand-computable cases (single repeated letter → 0 nats,
uniform 4 letters → ln 4, letterless → NULL); (2) every quantized term
on the fixture clears its rounding boundary by orders of magnitude
more than the ~2-ulp cross-engine ln divergence; (3) the quantized
estimator sits within its documented ~13 micro-nat bias of true
float entropy on the fixture.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.textstats import char_entropy_micro

SF = "/root/testdata/sf0.01"
LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _py_entropy_micro(text: str) -> int | None:
    counts = Counter(ch for ch in text.lower() if ch in LETTERS)
    n = sum(counts.values())
    if n == 0:
        return None
    total = sum(round(1e6 * c * math.log(c)) for c in counts.values() if c > 1)
    return round(1e6 * math.log(n)) - total // n


def test_hand_values(spark):
    rows = ["aaaa", "abcd", "the quick brown fox", "123 456", ""]
    df = spark.createDataFrame([(t,) for t in rows], "t: string")
    got = [
        r.h for r in df.select(char_entropy_micro(F.col("t")).alias("h")).collect()
    ]
    assert got == [_py_entropy_micro(t) for t in rows]
    assert got[0] == 0
    assert got[1] == round(1e6 * math.log(4))
    assert got[3] is None and got[4] is None


def test_fixture_terms_clear_rounding_boundaries():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT lower(text) FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    worst = 1.0
    for (lt,) in rows:
        counts = Counter(ch for ch in lt if ch in LETTERS)
        n = sum(counts.values())
        if n == 0:
            continue
        for v in [1e6 * math.log(n)] + [
            1e6 * c * math.log(c) for c in counts.values() if c > 1
        ]:
            worst = min(worst, abs(0.5 - abs(v - round(v))))
    # cross-engine ln divergence at these magnitudes is <= ~1e-9
    assert worst > 1e-6, worst


def test_quantized_estimator_tracks_true_entropy(spark):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM "
        f"read_parquet('{SF}/documents.parquet') LIMIT 200"
    ).fetchall()
    for (t,) in rows:
        counts = Counter(ch for ch in t.lower() if ch in LETTERS)
        n = sum(counts.values())
        if n == 0:
            continue
        true_h = 1e6 * (
            math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        )
        assert abs(_py_entropy_micro(t) - true_h) <= 15, t[:40]
