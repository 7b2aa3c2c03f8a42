"""DSIR importance weights: pure-Python twin, margin safety, and signal.

Three pins: (1) the operator's integer weights equal an independent
hashlib/math replay on synthetic docs; (2) the fixed-point micro-nat
quantization sits far from every rounding boundary on the fixture, so
the ≤2-ulp cross-engine ``ln`` divergence cannot flip a bucket (the
divergence-safety argument the suite docstring cites); (3) the method
actually discriminates — target-language docs are selected at a higher
rate than the rest.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.dsir import LOG_SCALE, dsir_weights

SF_ORACLE = "/root/testdata/sf0.01"
N_BUCKETS = 8  # small for the synthetic twin so buckets collide


def _bucket(gram: str, n: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % n


def _py_weights(docs: list[tuple[int, bool, list[str]]], n_buckets: int):
    """Replay: bigrams → md5 buckets → smoothed log ratios → weights."""
    cb: dict[tuple[int, int], int] = {}
    tb = [0] * n_buckets
    rb = [0] * n_buckets
    for doc_id, is_t, words in docs:
        for a, b in zip(words, words[1:]):
            k = _bucket(f"{a} {b}", n_buckets)
            cb[(doc_id, k)] = cb.get((doc_id, k), 0) + 1
            rb[k] += 1
            if is_t:
                tb[k] += 1
    t_tot, r_tot = sum(tb), sum(rb)
    lr = [
        round(
            LOG_SCALE
            * math.log(
                float((tb[k] + 1) * (r_tot + n_buckets))
                / float((rb[k] + 1) * (t_tot + n_buckets))
            )
        )
        for k in range(n_buckets)
    ]
    out: dict[int, int] = {}
    for (doc_id, k), c in cb.items():
        out[doc_id] = out.get(doc_id, 0) + c * lr[k]
    return out


def test_weights_match_python_replay(spark):
    docs = [
        (1, True, "the cat sat on the mat".split()),
        (2, True, "the dog sat on the rug".split()),
        (3, False, "der hund sitzt auf dem teppich".split()),
        (4, False, "el gato come pescado fresco hoy".split()),
        (5, False, "the cat sat quietly".split()),  # target-ish features
        (6, True, "one"),  # single word → no bigrams → no weight row
    ]
    df = spark.createDataFrame(
        [(i, t, list(w) if not isinstance(w, str) else [w]) for i, t, w in docs],
        "doc_id: long, is_t: boolean, words: array<string>",
    )
    got = {
        r.id: r.weight
        for r in dsir_weights(
            df, "doc_id", "words", F.col("is_t"), n_buckets=N_BUCKETS
        ).collect()
    }
    expect = _py_weights(
        [(i, t, w if isinstance(w, list) else [w]) for i, t, w in docs],
        N_BUCKETS,
    )
    assert got == expect
    assert 6 not in got  # bigram-less doc yields no row
    # the target-shaped docs outscore the foreign ones
    assert min(got[1], got[2]) > max(got[3], got[4])


def test_fixture_log_ratios_clear_rounding_boundaries():
    """Every bucket's unrounded 1e6·ln(...) must sit ≥1e-3 from the
    nearest .5 boundary — six orders of magnitude above the worst
    cross-engine ln divergence (~5e-9 at this scale), so Spark and
    DuckDB cannot round differently on this data."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    rows = con.execute(
        r"""
        WITH w AS (
          SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS words
          FROM documents
        ), bg AS (
          SELECT doc_id, lang, unnest(list_transform(range(len(words)-1),
                i -> list_extract(words, i+1) || ' ' || list_extract(words, i+2)))
                AS g
          FROM w
        ), cb AS (
          SELECT doc_id, CASE WHEN lang='en' THEN 1 ELSE 0 END AS is_target,
                 CAST('0x' || substr(md5(g),1,4) AS INTEGER) % 64 AS bucket,
                 COUNT(*) AS c
          FROM bg GROUP BY 1,2,3
        ), pb AS (
          SELECT bucket, SUM(c*is_target) AS t_b, SUM(c) AS r_b
          FROM cb GROUP BY bucket
        )
        SELECT t_b, r_b, (SELECT SUM(t_b) FROM pb), (SELECT SUM(r_b) FROM pb)
        FROM pb
        """
    ).fetchall()
    assert len(rows) == 64
    for t_b, r_b, t_tot, r_tot in rows:
        v = LOG_SCALE * math.log(
            float((t_b + 1) * (r_tot + 64)) / float((r_b + 1) * (t_tot + 64))
        )
        frac = abs(v - round(v))
        assert abs(0.5 - frac) > 1e-3, (t_b, r_b, v)


def test_selection_favors_target_language(spark):
    from kafka_bigdata_jobs_spark.operators.textproj import tokenized_documents

    p = tokenized_documents(spark, SF_ORACLE)
    w = dsir_weights(
        p, "doc_id", "words", F.col("lang") == "en", n_buckets=64
    ).withColumnRenamed("id", "doc_id")
    rates = {
        r.grp: r.sel / r.n
        for r in p.select("doc_id", (F.col("lang") == "en").alias("grp"))
        .join(w, "doc_id", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("weight") > 0).cast("long")).alias("sel"),
        )
        .collect()
    }
    assert rates[True] > rates[False] + 0.15, rates
