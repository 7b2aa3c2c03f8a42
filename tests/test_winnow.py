"""Winnowing fingerprint guarantee: a shared substring of length
>= k + window - 1 yields at least one shared fingerprint."""

from kafka_bigdata_jobs_spark.operators.textstats import winnow_fingerprints


def test_shared_substring_shares_fingerprint(spark):
    shared = "abcdefghijklmnopqrstuvw"  # 23 = k(8) + window(16) - 1
    docs = spark.createDataFrame(
        [
            (1, "xxxx" + shared + "yyyyyyyy"),
            (2, "zzzzzzzzzz" + shared + "qqqq"),
            (3, "totally different content here with no overlap at all.."),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=8, window=16)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring produced no shared fingerprint"
    # determinism
    again = {}
    for r in winnow_fingerprints(docs, "doc_id", "text", k=8, window=16).collect():
        again.setdefault(r.doc_id, set()).add(r.fp)
    assert again == by_doc


def test_short_text_yields_no_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "x" * 22), (3, "y" * 23)],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in winnow_fingerprints(docs, "doc_id", "text").collect()}
    # needs at least k + window - 1 = 23 chars for one full window
    assert got == {3}
