"""A-ES weighted sampling: replay twin, margins, and sampling signal.

The dsir/bm25 three-pin discipline: (1) the operator equals an
independent hashlib/math replay; (2) the fixture's quantized clocks sit
far from every rounding boundary, so the ~2-ulp cross-engine ``ln``
divergence cannot flip an integer; (3) the sampler actually weights —
across many seeds a heavy item is drawn far more often than a light
one, and inclusion probabilities are seed-stable per seed.
"""

from __future__ import annotations

import hashlib
import math

from kafka_bigdata_jobs_spark.operators.sampling import (
    LOG_SCALE,
    weighted_sample_per_group,
)

SF = "/root/testdata/sf0.01"


def _clock(seed: str, ident: int, w: int) -> int:
    h = int(hashlib.md5(f"{seed}{ident}".encode()).hexdigest()[:12], 16)
    u = (h + 1) / float(1 << 48)
    return round(LOG_SCALE * -math.log(u) / w)


def _py_sample(rows, k: int, seed: str):
    by_group: dict[str, list] = {}
    for g, ident, w in rows:
        if w > 0:
            by_group.setdefault(g, []).append((_clock(seed, ident, w), ident))
    out = {}
    for g, items in by_group.items():
        for rank, (p, ident) in enumerate(sorted(items), start=1):
            if rank <= k:
                out[(g, ident)] = (rank, p)
    return out


def test_sample_matches_python_replay(spark):
    rows = [("a", i, (i % 5) + 1) for i in range(40)] + [
        ("b", i, 7) for i in range(100, 120)
    ] + [("a", 999, 0)]  # zero weight: never drawn
    df = spark.createDataFrame(rows, "g: string, id: long, w: long")
    got = {
        (r.g, r.id): (r.rank, r.priority_micro)
        for r in weighted_sample_per_group(
            df, ["g"], "id", "w", k=5, seed="t1"
        ).collect()
    }
    assert got == _py_sample(rows, 5, "t1")
    assert not any(ident == 999 for _, ident in got)


def test_fixture_clocks_clear_rounding_boundaries():
    """Worst cross-engine divergence of the double ln at this magnitude
    is ~3e-9 absolute (in micro-nat units); require every fixture clock
    to clear its .5 boundary by >1e-7 — two orders of safety."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    rows = con.execute(
        r"""
        SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS wt
        FROM documents WHERE len(string_split_regex(trim(text), '\s+')) > 0
        """
    ).fetchall()
    assert len(rows) >= 400  # sf0.01 carries 500 docs
    worst = 1.0
    for doc_id, wt in rows:
        h = int(hashlib.md5(f"aes-v1{doc_id}".encode()).hexdigest()[:12], 16)
        v = LOG_SCALE * -math.log((h + 1) / float(1 << 48)) / wt
        worst = min(worst, abs(0.5 - abs(v - round(v))))
    assert worst > 1e-7, worst


def test_weights_bias_selection(spark):
    # one group: ids 0..9 weight 10, ids 10..99 weight 1.  Across 60
    # seeds with k=10, heavy ids should be drawn at several times the
    # light-id rate (expected inclusion ~0.66 vs ~0.04 per A-ES).
    rows = [("g", i, 10 if i < 10 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "g: string, id: long, w: long")
    heavy = light = 0
    for s in range(60):
        sel = [
            r.id
            for r in weighted_sample_per_group(
                df, ["g"], "id", "w", k=10, seed=f"s{s}"
            ).collect()
        ]
        heavy += sum(1 for i in sel if i < 10)
        light += sum(1 for i in sel if i >= 10)
    assert heavy / 60 / 10 > 3 * (light / 60 / 90), (heavy, light)
