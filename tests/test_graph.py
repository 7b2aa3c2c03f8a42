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


def _reference_pagerank(edge_list, n_iter=5, damping_bp=8500, init_bp=10000):
    """Independent pure-Python twin of the integer iteration."""
    from collections import defaultdict

    outdeg: dict = defaultdict(int)
    for s, _ in edge_list:
        outdeg[s] += 1
    nodes = {n for e in edge_list for n in e}
    base = (10000 - damping_bp) * init_bp // 10000
    score = {n: init_bp for n in nodes}
    for _ in range(n_iter):
        nxt = defaultdict(lambda: base)
        for s, d in edge_list:
            nxt[d] += score[s] * damping_bp // (10000 * outdeg[s])
        score = {n: nxt[n] for n in nodes}
    return dict(score)


def test_pagerank_matches_pure_python_reference(spark):
    """Exact-equality twin check on a batch of seeded random graphs —
    the integer discipline means EVERY score must agree, not just
    rankings."""
    import random

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n = rng.randint(4, 12)
        base = [(a, b) for a in range(n) for b in range(n)
                if a != b and rng.random() < 0.4]
        if not base:
            base = [(0, 1)]
        edges = sorted(set(base) | {(b, a) for a, b in base})
        assert _ranks(spark, edges) == _reference_pagerank(edges), f"seed {seed}"


def test_source_only_node_keeps_teleport_score(spark):
    """Regression (round-2 advisor): a node with outgoing but no incoming
    edges satisfies the operator's contract yet used to vanish after
    iteration 1 (groupBy over contributions alone), losing its teleport
    score AND its downstream contributions."""
    edges = [(1, 2), (2, 3), (3, 2)]
    got = _ranks(spark, edges)
    want = _reference_pagerank(edges)
    assert got == want
    assert got[1] == 1500  # teleport-only, never dropped
    assert got[2] > got[3] > got[1]


def test_pagerank_asymmetric_random_graphs_match_twin(spark):
    """Directed (non-symmetrized) graphs where every node has outdeg>=1
    but in-degree may be 0 — the shape the symmetric-only suite missed."""
    import random

    for seed in (7, 11, 13):
        rng = random.Random(seed)
        n = rng.randint(4, 10)
        edges = set()
        for a in range(n):
            # guarantee the outgoing-edge contract per node
            targets = rng.sample([b for b in range(n) if b != a],
                                 k=rng.randint(1, min(3, n - 1)))
            edges.update((a, b) for b in targets)
        edges = sorted(edges)
        assert _ranks(spark, edges) == _reference_pagerank(edges), f"seed {seed}"
