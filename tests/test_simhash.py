"""SimHash pigeonhole completeness: the banded candidate generation
must find EVERY pair within the hamming bound (4 x 16-bit chunks
guarantee any hamming<=3 pair shares one exact chunk), and popcount
verification must keep nothing beyond it."""

from kafka_bigdata_jobs_spark.operators.dedup import (
    simhash_near_pairs,
    simhash_signatures,
)
from kafka_bigdata_jobs_spark.schemas import load_table

SF = "/root/testdata/sf0.001"

# signatures are 64-bit two's-complement longs; Python ints are
# arbitrary-precision, so mask the XOR before popcounting
MASK64 = (1 << 64) - 1


def test_simhash_pairs_equal_bruteforce(spark):
    docs = load_table(spark, SF, "documents")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, "doc_id", "text").collect()
    }
    ids = sorted(sigs)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sigs[a] ^ sigs[b]) & MASK64).count("1") <= 3:
                expected.add((a, b))
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert set(got) == expected
    for (a, b), h in got.items():
        assert h == bin((sigs[a] ^ sigs[b]) & MASK64).count("1")
