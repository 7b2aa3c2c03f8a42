"""Integer PageRank: hand-computable fixtures + determinism.

The suite query ``customer_supplier_pagerank`` is oracle-gated (DuckDB
recursive CTE reproduces the integer arithmetic exactly — covered by
test_oracle_parity); these tests pin the operator itself on graphs
small enough to verify by hand.
"""

from __future__ import annotations

from kafka_bigdata_jobs_spark.operators.graph import pagerank_bp, personalized_pagerank_bp


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


# ---------------------------------------------------------------------------
# oriented_triangles: hand cases + pure-Python twin fuzz
# ---------------------------------------------------------------------------

from kafka_bigdata_jobs_spark.operators.graph import (  # noqa: E402
    bfs_distances,
    oriented_triangles,
)


def _tri(spark, canon_edges):
    edges = spark.createDataFrame(canon_edges, "u long, v long")
    rows = oriented_triangles(edges, "u", "v").collect()
    return {r["node"]: (r["degree"], r["n_tri"]) for r in rows}


def _reference_triangles(canon_edges):
    """Brute-force twin: degree + per-node triangle membership."""
    from collections import defaultdict
    from itertools import combinations

    es = set(canon_edges)
    nodes = sorted({n for e in es for n in e})
    deg: dict = defaultdict(int)
    adj: dict = defaultdict(set)
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
        adj[a].add(b)
        adj[b].add(a)
    tri: dict = defaultdict(int)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


def test_single_triangle(spark):
    got = _tri(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_star_has_no_triangles(spark):
    got = _tri(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    assert got[0] == (4, 0)
    assert all(got[leaf] == (1, 0) for leaf in (1, 2, 3, 4))


def test_k4_every_node_in_three_triangles(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {n: (3, 3) for n in range(4)}


def test_hub_skew_graph_matches_twin(spark):
    # One hub wired to everything plus a sparse periphery — the shape
    # degree-orientation exists for (wedges generate at the LOW-degree
    # apex, never fanning out quadratically at the hub).
    periphery = [(a, a + 1) for a in range(1, 10)]
    hub = [(0, b) for b in range(1, 11)]
    edges = sorted(set(periphery + hub))
    assert _tri(spark, edges) == _reference_triangles(edges)


def test_triangles_random_graphs_match_twin(spark):
    import random

    for seed in (3, 5, 9):
        rng = random.Random(seed)
        n = rng.randint(5, 14)
        edges = sorted(
            {(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.45}
        )
        if not edges:
            edges = [(0, 1)]
        assert _tri(spark, edges) == _reference_triangles(edges), f"seed {seed}"


# ---------------------------------------------------------------------------
# bfs_distances: hand cases + pure-Python twin fuzz
# ---------------------------------------------------------------------------


def _bfs(spark, edge_list, seed_nodes, k):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(s,) for s in seed_nodes], "node long")
    rows = bfs_distances(edges, seeds, max_hops=k).collect()
    return {r["node"]: r["dist"] for r in rows}


def _reference_bfs(edge_list, seed_nodes, k):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edge_list:
        adj[s].append(d)
    dist = {s: 0 for s in seed_nodes}
    dq = deque(seed_nodes)
    while dq:
        n = dq.popleft()
        if dist[n] >= k:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    return dist


def test_bfs_path_graph(spark):
    edges = [(i, i + 1) for i in range(6)]
    assert _bfs(spark, edges, [0], 3) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_unreachable_component_absent(spark):
    edges = [(0, 1), (2, 3)]
    got = _bfs(spark, edges, [0], 4)
    assert got == {0: 0, 1: 1}


def test_bfs_multi_seed_takes_min_distance(spark):
    edges = [(0, 1), (1, 2), (2, 3), (5, 3)]
    got = _bfs(spark, edges, [0, 5], 4)
    assert got == {0: 0, 5: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_early_stop_on_exhausted_frontier(spark):
    # Frontier drains at hop 2; the loop must exit, not run 9 empty jobs.
    edges = [(0, 1), (1, 2)]
    assert _bfs(spark, edges, [0], 9) == {0: 0, 1: 1, 2: 2}


def test_bfs_random_digraphs_match_twin(spark):
    import random

    for seed in (2, 4, 8):
        rng = random.Random(seed)
        n = rng.randint(5, 12)
        edges = sorted(
            {(a, b) for a in range(n) for b in range(n)
             if a != b and rng.random() < 0.25}
        )
        if not edges:
            edges = [(0, 1)]
        seeds = [0, n - 1]
        k = rng.randint(1, 4)
        assert _bfs(spark, edges, seeds, k) == _reference_bfs(edges, seeds, k), (
            f"seed {seed}"
        )


# ---------------------------------------------------------------------------
# Personalized PageRank
# ---------------------------------------------------------------------------


def _ppr(spark, edge_list, seeds: dict, n_iter=5):
    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    restart = spark.createDataFrame(
        [(n, bp) for n, bp in seeds.items()], "node: long, restart_bp: long"
    )
    rows = personalized_pagerank_bp(edges, restart, n_iter=n_iter).collect()
    return {r.node: r.score_bp for r in rows}


def _reference_ppr(edge_list, seeds: dict, n_iter=5, damping_bp=8500):
    from collections import defaultdict

    outdeg: dict = defaultdict(int)
    for s, _ in edge_list:
        outdeg[s] += 1
    nodes = {s for s, _ in edge_list}  # operator contract: src side = node set
    restart = {n: seeds.get(n, 0) for n in nodes}
    tele = {n: (10000 - damping_bp) * restart[n] // 10000 for n in nodes}
    score = {n: restart[n] for n in nodes}
    for _ in range(n_iter):
        nxt = {n: tele[n] for n in nodes}
        for s, d in edge_list:
            if d in nxt:
                nxt[d] += score[s] * damping_bp // (10000 * outdeg[s])
        score = nxt
    return score


def test_ppr_matches_python_twin_on_random_graphs(spark):
    import random

    for seed in (7, 21, 63):
        rng = random.Random(seed)
        n = 14
        edges = set()
        for _ in range(40):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((a, b))
                edges.add((b, a))  # undirected -> every node has out-edges
        edges = sorted(edges)
        seed_nodes = {v: 10000 for v in rng.sample(range(n), 3)}
        assert _ppr(spark, edges, seed_nodes) == _reference_ppr(
            edges, seed_nodes
        ), f"seed {seed}"


def test_ppr_mass_localizes_at_seed(spark):
    # 6-cycle (both directions), single seed at node 0.  Finite power
    # iteration oscillates ring-by-ring, so scores aren't monotone in
    # distance yet — but the seed's symmetry must hold exactly
    # (dist-1 pair equal, dist-2 pair equal) and every node within two
    # hops outranks the antipode.
    n = 6
    edges = []
    for i in range(n):
        edges += [(i, (i + 1) % n), ((i + 1) % n, i)]
    got = _ppr(spark, edges, {0: 10000})
    assert got == _reference_ppr(edges, {0: 10000})
    assert got[1] == got[5] and got[2] == got[4]
    # near convergence (20 rounds) the ring oscillation has damped out
    # and locality holds: seed > dist-1 > dist-2 > antipode.
    conv = _ppr(spark, edges, {0: 10000}, n_iter=20)
    assert conv == _reference_ppr(edges, {0: 10000}, n_iter=20)
    assert conv[0] > conv[1] > conv[2] > conv[3]


def test_ppr_zero_restart_and_outside_seed(spark):
    edges = [(1, 2), (2, 1)]
    # seed 99 is not in the graph: ignored, everything decays to zero
    got = _ppr(spark, edges, {99: 10000})
    assert got == {1: 0, 2: 0}
