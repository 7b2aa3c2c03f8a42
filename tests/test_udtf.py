"""Python UDTF surface (operators/udtf.py) edge cases."""

from kafka_bigdata_jobs_spark.operators.udtf import word_runs


def test_word_runs_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "a b a"),
            (3, "  x \t x\ny  "),
            (4, ""),
            (5, None),
            (6, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.run_idx): (r.word, r.run_len)
        for r in word_runs(spark, docs, "doc_id", "text").collect()
    }
    assert rows[(1, 0)] == ("a", 3)
    assert rows[(2, 0)] == ("a", 1)
    assert rows[(2, 1)] == ("b", 1)
    assert rows[(2, 2)] == ("a", 1)
    # mixed whitespace tokenizes like str.split
    assert rows[(3, 0)] == ("x", 2)
    assert rows[(3, 1)] == ("y", 1)
    assert rows[(6, 0)] == ("solo", 1)
    # empty and null texts emit nothing
    assert not any(d in (4, 5) for d, _ in rows)
