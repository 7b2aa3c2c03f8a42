"""Hyperplane-LSH ANN recall against the exact (oracle-verified)
brute-force top-k.  The driver's rows-only check cannot detect a
recall collapse (e.g. a plane count that leaves <1 vector per bucket),
so this pins the floor, and checks multi-probe pays for itself."""

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.similarity import (
    topk_neighbors,
    topk_neighbors_hyperplane_lsh,
)
from kafka_bigdata_jobs_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _topk_sets(df, k=10):
    by_q = {}
    for r in df.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    return {
        q: {r["neighbor_id"] for r in sorted(rs, key=lambda r: -r["cosine"])[:k]}
        for q, rs in by_q.items()
    }


def _mean_recall(exact, got):
    return sum(len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact) / len(
        exact
    )


def test_hyperplane_lsh_recall_floor(spark):
    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(topk_neighbors(e, queries, "vec_id", "embedding", k=10))

    auto = _topk_sets(
        topk_neighbors_hyperplane_lsh(e, queries, "vec_id", "embedding", k=10)
    )
    auto_recall = _mean_recall(exact, auto)
    # measured 0.685 on this fixture; generous margin against plane/
    # bucketing regressions (chance level is 10/500 = 0.02)
    assert auto_recall >= 0.5, f"auto-sized multi-probe recall collapsed: {auto_recall:.3f}"

    single = _topk_sets(
        topk_neighbors_hyperplane_lsh(
            e, queries, "vec_id", "embedding", k=10, multi_probe=False
        )
    )
    assert auto_recall > _mean_recall(exact, single), (
        "multi-probe should beat single-probe recall"
    )


def test_kmeans_ivf_recall_floor(spark):
    from kafka_bigdata_jobs_spark.operators.similarity import (
        topk_neighbors_ivf_kmeans,
    )

    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(topk_neighbors(e, queries, "vec_id", "embedding", k=10))
    got = _topk_sets(
        topk_neighbors_ivf_kmeans(e, queries, "vec_id", "embedding", k=10, n_probe=3)
    )
    rec = _mean_recall(exact, got)
    # measured 0.505 probing 3/16 cells; floor with margin (chance 0.02,
    # label-as-cell baseline 0.135)
    assert rec >= 0.35, f"k-means IVF recall collapsed: {rec:.3f}"


def test_pq_adc_rerank_recall_floor(spark):
    """PQ ADC with 5x-oversample exact re-rank must hold recall@10 >=
    0.8 on the smoke fixture (codebooks clamp to sample//4 centroids on
    a corpus this small; at sf0.01 measured 0.98).  Also pins that the
    compressed candidate scan plus re-rank returns exactly k rows per
    query with exact cosine scores."""
    from kafka_bigdata_jobs_spark.operators.similarity import topk_neighbors_pq

    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(topk_neighbors(e, queries, "vec_id", "embedding", k=10))
    pq_df = topk_neighbors_pq(e, queries, "vec_id", "embedding", k=10)
    rows = pq_df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == set(exact)
    for q, rs in per_q.items():
        assert len(rs) == 10
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, 11)
        )
    got = _topk_sets(pq_df)
    assert _mean_recall(exact, got) >= 0.8


def test_ivfpq_recall_floor(spark):
    """IVF-PQ (cell-probe + compressed ADC + exact re-rank) must hold
    recall@10 >= 0.45 on the smoke fixture.  The ceiling here is
    cell-probe geometry, not PQ: the exact-scoring k-means IVF measures
    ~0.5 on the same quasi-random 64-dim corpus (curse of
    dimensionality — cells barely separate), and IVF-PQ with n_probe=6
    measures >= it.  On clustered real-world embeddings both rise
    together; the floor protects against a broken ADC/probe path, not
    against fixture geometry."""
    from kafka_bigdata_jobs_spark.operators.similarity import topk_neighbors_ivfpq

    e = load_table(spark, SF, "embeddings")
    queries = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(topk_neighbors(e, queries, "vec_id", "embedding", k=10))
    got = _topk_sets(topk_neighbors_ivfpq(e, queries, "vec_id", "embedding", k=10))
    assert _mean_recall(exact, got) >= 0.45


def test_cluster_profile_covers_corpus_deterministically(spark):
    from kafka_bigdata_jobs_spark import suite

    fn = suite.registry()["embedding_cluster_profile"].fn
    sf = "/root/testdata/sf0.001"
    a = fn(spark, sf).orderBy("cell_id").collect()
    b = fn(spark, sf).orderBy("cell_id").collect()
    assert a == b, "seeded k-means census must be run-stable"
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in a) == n
    assert all(r.n_vectors > 0 for r in a)
