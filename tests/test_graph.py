"""Integer PageRank: hand-computable fixtures + determinism.

The suite query ``customer_supplier_pagerank`` is oracle-gated (DuckDB
recursive CTE reproduces the integer arithmetic exactly — covered by
test_oracle_parity); these tests pin the operator itself on graphs
small enough to verify by hand.
"""

from __future__ import annotations

from kafka_bigdata_jobs_spark.operators.graph import pagerank_bp


def _ranks(spark, edge_list, n_iter=5):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    rows = pagerank_bp(edges, n_iter=n_iter).collect()
    return {r["node"]: r["score_bp"] for r in rows}


def test_two_node_cycle_is_stationary(spark):
    # score' = 1500 + floor(10000*8500/10000)//1 = 1500 + 8500 = 10000:
    # the symmetric 2-cycle is a fixed point of the integer iteration.
    got = _ranks(spark, [(1, 2), (2, 1)], n_iter=3)
    assert got == {1: 10000, 2: 10000}


def test_star_graph_hand_computed(spark):
    # Hub 0 <-> leaves 1,2,3 (undirected).  Hand iteration:
    #   hub' = 1500 + 3*floor(leaf*8500/10000)      (leaves have outdeg 1)
    #   leaf' = 1500 + floor(hub*8500/(10000*3))    (hub outdeg 3)
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)]
    hub, leaf = 10000, 10000
    for _ in range(5):
        hub, leaf = (
            1500 + 3 * (leaf * 8500 // 10000),
            1500 + (hub * 8500 // (10000 * 3)),
        )
    got = _ranks(spark, edges, n_iter=5)
    assert got[0] == hub
    assert got[1] == got[2] == got[3] == leaf
    assert got[0] > got[1]  # hub accumulates rank


def test_pagerank_is_deterministic_across_runs(spark):
    edges = [(a, b) for a in range(8) for b in range(8) if a != b and (a + b) % 3]
    edges = edges + [(b, a) for a, b in edges]
    r1 = _ranks(spark, edges)
    r2 = _ranks(spark, edges)
    assert r1 == r2


def test_conservation_bound(spark):
    # Teleport injects 1500/node/iter; floor() only ever discards mass,
    # so total score never exceeds n * init.
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)]
    got = _ranks(spark, edges, n_iter=4)
    assert sum(got.values()) <= 3 * 10000
    assert all(v >= 1500 for v in got.values())
