"""Python UDTF surface (Spark 4): one row in, many rows out.

The reference's only UDF is scalar (``streaming/job3_sentiment.py:243``);
its row-expanding needs (hashtag/mention explode) all fit builtin
``explode``.  This module demonstrates the engine's user-defined TABLE
function slot — the escape hatch for row-expanding logic that has no
builtin equivalent — on semantics a SQL oracle can verify exactly:
run-length encoding of consecutive repeated words.

Scale notes: a UDTF runs row-at-a-time in the Python worker (slow
path, like any Python UDF), but it parallelizes per-partition and
holds only one document at a time — no per-group or per-partition
materialization.  Prefer builtin explode/transform when the expansion
is expressible (see ``pipeline.chunk_documents`` for the codegen'd
equivalent); reach for a UDTF only when per-row imperative state (the
run scanner here) would otherwise force a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="run_idx int, word string, run_len int")
class RLEWords:
    """Emit (run_idx, word, run_len) per maximal run of equal words.

    ``str.split()`` (any whitespace, ignores leading/trailing) keeps
    tokenization identical to the oracle's
    ``string_split_regex(trim(text), '\\s+')``.
    """

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            return
        words = text.split()
        run_idx = 0
        i = 0
        while i < len(words):
            j = i
            while j < len(words) and words[j] == words[i]:
                j += 1
            yield run_idx, words[i], j - i
            run_idx += 1
            i = j


def word_runs(spark: SparkSession, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Run-length encode ``text_col`` via a lateral-joined Python UDTF.

    Returns one row per (doc, run): ``id_col, run_idx, word, run_len``.
    """
    spark.udtf.register("rle_words", RLEWords)
    docs.select(id_col, text_col).createOrReplaceTempView("__rle_docs")
    return spark.sql(
        f"SELECT d.{id_col}, s.run_idx, s.word, s.run_len "
        f"FROM __rle_docs d, LATERAL rle_words(d.{text_col}) s"
    )
