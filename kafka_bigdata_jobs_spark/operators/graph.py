"""Iterative graph algorithms over edge relations (beyond-reference;
the reference has no graph surface — this extends the engine toward
link-analysis workloads a training-data pipeline meets when ranking
domains/hosts for crawl curation, cf. the public PageRank formulation,
Page et al. 1999).

Scale design
------------

A graph at 100 TB is an EDGE RELATION, not an object graph: every
iteration is one equi-join (ranks ⋈ edges on src) plus one aggregation
(sum contributions by dst) — the two shuffles land on the same key
space, so a pre-partitioned/bucketed edge table makes each iteration a
single co-located pass.  Iteration count is fixed and small (power
iteration converges geometrically at damping^k); lineage is cut with
``localCheckpoint`` every few rounds so the plan doesn't deepen
unboundedly (same discipline as ``dedup.connected_components``).

Determinism discipline
----------------------

All scores are basis-point INTEGERS and every per-edge contribution is
``floor(score * damping_bp / (10000 * out_degree))`` — pure int64
arithmetic, so results are bit-identical whatever the partitioning or
summation order, and a SQL engine (DuckDB recursive CTE with integer
``//``) reproduces them exactly.  Float PageRank would differ in the
last ulp per partition order; integer PageRank is oracle-gatable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: After this many join+agg rounds the lineage is cut.  Spark's
#: optimizer re-analyzes the full plan each action; past ~8 self-joined
#: stages analysis time dominates, so checkpoint earlier than that.
CHECKPOINT_EVERY = 4


def pagerank_bp(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_bp: int = 8500,
    init_bp: int = 10000,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge relation.

    ``edges`` must be distinct (src, dst) pairs; every node is assumed
    to have at least one outgoing edge (feed an undirected graph as
    both directions — the customer/supplier bipartite case — or add
    self-loops for dangling nodes upstream).

    Returns ``(node, score_bp)``: node ids with their final
    basis-point score after ``n_iter`` rounds of

        score' = (10000 - damping_bp) * init_bp / 10000
               + Σ_in floor(score_src * damping_bp / (10000 * outdeg_src))

    All arithmetic is int64; the teleport term is itself an exact
    integer for the default (1500 bp · init 10000 bp / 10000 = 1500).
    """
    base_bp = (10000 - damping_bp) * init_bp // 10000

    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    # One co-located relation: (src, dst, outdeg_src).  At scale this is
    # the bucketed artifact every iteration re-joins against — so
    # PERSIST it: without this, each of the n_iter joins recomputes the
    # whole upstream edge derivation (measured 7.8 s -> 2 s at sf0.1 on
    # the customer/supplier graph, where upstream is a lineitem×orders
    # join + distinct).
    ed = edges.join(deg, src).persist()

    # Every node is required to have an outgoing edge, so the src side
    # alone enumerates the node set — and it reads the persisted ed.
    # Persisted too: every iteration re-anchors on it (see below), and
    # it is one row per node, far smaller than the edge relation.
    nodes = ed.select(F.col(src).alias("node")).distinct().persist()
    ranks = nodes.withColumn("score_bp", F.lit(init_bp).cast("long"))

    for it in range(n_iter):
        contrib = (
            ed.join(ranks, ed[src] == ranks["node"])
            .select(
                F.col(dst).alias("node"),
                F.expr(f"(score_bp * {damping_bp}) div (10000 * __outdeg)").alias(
                    "__c"
                ),
            )
        )
        # Re-anchor on the FULL node set: a groupBy over contributions
        # alone only reproduces nodes that receive at least one
        # contribution, silently dropping source-only nodes (no in-edges)
        # after the first iteration — they must keep their teleport term
        # base_bp and continue feeding downstream, matching the pure
        # integer formulation (and the test twin in test_graph.py).
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (F.lit(base_bp) + F.coalesce(F.col("__s"), F.lit(0)))
            .cast("long")
            .alias("score_bp"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    # Materialize the (small: one row per node) result so the edge
    # artifact can be released — callers get a checkpointed frame with
    # no live dependency on ed.
    ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    ed.unpersist()
    return ranks


def oriented_triangles(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Per-node triangle counts over an undirected graph.

    ``edges`` must be distinct canonical pairs with ``u < v`` (one row
    per undirected edge, no self-loops).  Returns ``(node, degree,
    n_tri)`` for every node, where ``n_tri`` is the number of triangles
    the node participates in.

    Scale design (Suri & Vassilvitskii, WWW'11 — "the curse of the last
    reducer", public method): edges are ORIENTED from the lower-ranked
    endpoint to the higher under the total order ``(degree, node)``.
    Every wedge is then generated at its lowest-ranked apex, whose
    out-degree under this orientation is O(sqrt(m)) — so the wedge
    relation is bounded by m^1.5 regardless of hub skew, where the
    naive per-node neighbor-pair fan-out is quadratic in the hub
    degree.  Wedge closure is one equi-join back against the oriented
    edge relation: three shuffles total (degree agg, wedge self-join,
    closure join), no iteration, all on edge keys.
    """
    deg = (
        edges.select(F.col(u).alias("node"))
        .unionAll(edges.select(F.col(v).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # Annotate both endpoints with their degree, then orient low -> high
    # under (degree, node).  The degree relation is one row per node —
    # broadcast at sf, a co-partitioned join at 100 TB.
    ann = (
        edges.join(deg.select(F.col("node").alias(u), F.col("degree").alias("__du")), u)
        .join(deg.select(F.col("node").alias(v), F.col("degree").alias("__dv")), v)
    )
    lo_is_u = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col(u) < F.col(v))
    )
    oriented = ann.select(
        F.when(lo_is_u, F.col(u)).otherwise(F.col(v)).alias("lo"),
        F.when(lo_is_u, F.col(v)).otherwise(F.col(u)).alias("hi"),
        F.when(lo_is_u, F.col("__dv")).otherwise(F.col("__du")).alias("__dhi"),
    ).persist()

    # Wedges at their lowest-ranked apex: out-neighbor pairs (b, c) of a,
    # themselves ordered by the SAME (degree, node) rank so each wedge
    # appears exactly once and the closure probe is directly against the
    # oriented edge (b, c).
    a1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("b"), F.col("__dhi").alias("__db"))
    a2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("c"), F.col("__dhi").alias("__dc"))
    wedges = a1.join(a2, "apex").where(
        (F.col("__db") < F.col("__dc"))
        | ((F.col("__db") == F.col("__dc")) & (F.col("b") < F.col("c")))
    )
    tri = wedges.join(
        oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
        ["b", "c"],
    ).select("apex", "b", "c")

    # Every triangle credits all three corners.
    corners = (
        tri.select(F.col("apex").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    out = deg.join(corners, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    )
    out = out.localCheckpoint(eager=True)
    oriented.unpersist()
    return out


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Minimum hop distance from a seed set, bounded at ``max_hops``.

    ``edges`` is a DIRECTED relation (feed both directions for an
    undirected graph); ``seeds`` has one column ``node``.  Returns
    ``(node, dist)`` for every node reachable within ``max_hops``,
    ``dist`` being the minimum number of hops (seeds themselves at 0).

    Scale design: classic frontier-expansion BFS — each hop is one
    equi-join (frontier ⋈ edges on src) plus one left-anti join against
    the visited set, both on the node key space, so a bucketed edge
    table makes every hop co-located.  The frontier relation only ever
    holds NEW nodes (anti-join against visited), so total work across
    all hops is O(edges touched), not O(hops × nodes) — the
    path-enumeration blowup of a naive recursive expansion never
    materializes.  Lineage is cut with ``localCheckpoint`` every
    ``CHECKPOINT_EVERY`` hops, same discipline as :func:`pagerank_bp`.
    """
    # Each hop's frontier is materialized (localCheckpoint eager) before
    # it joins into `visited`, so the visited relation is a shallow
    # union of already-computed pieces — the anti-join never re-derives
    # earlier hops and the plan depth stays constant per hop.
    frontier = (
        seeds.select(F.col("node"), F.lit(0).cast("int").alias("dist"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.select("node")
            .join(edges, F.col("node") == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt)
        frontier = nxt
    return visited


def personalized_pagerank_bp(
    edges: DataFrame,
    restart: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_bp: int = 8500,
) -> DataFrame:
    """Personalized PageRank (topic-sensitive PageRank, Haveliwala
    2002 — public method): like :func:`pagerank_bp`, but the teleport
    mass returns to a SEED distribution instead of uniformly, so the
    ranking answers "important relative to these seeds" — the
    recommendation/affinity shape (suppliers relevant to one customer
    segment, domains relevant to a topic crawl).

    ``restart`` carries ``(node, restart_bp)``; nodes absent from it
    get zero teleport (seeds outside the graph are ignored — they have
    no edges to carry mass).  Per-node update, all int64::

        score' = (10000 - damping_bp) * restart_bp // 10000
               + Σ_in floor(score_src * damping_bp / (10000 * outdeg))

    with ``score_0 = restart_bp``.  Same iteration shape and
    determinism discipline as :func:`pagerank_bp` (one join + one agg
    per round on a persisted degree-annotated edge relation, full
    node-set re-anchor, checkpointed lineage, DuckDB-recursive-CTE
    reproducible).
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    ed = edges.join(deg, src).persist()

    nodes = ed.select(F.col(src).alias("node")).distinct()
    nt = (
        nodes.join(restart, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("restart_bp"), F.lit(0)).cast("long").alias(
                "restart_bp"
            ),
        )
        .withColumn(
            "__tele",
            F.expr(f"((10000 - {damping_bp}) * restart_bp) div 10000"),
        )
        .persist()
    )
    ranks = nt.select("node", F.col("restart_bp").alias("score_bp"))

    for it in range(n_iter):
        contrib = ed.join(ranks, ed[src] == ranks["node"]).select(
            F.col(dst).alias("node"),
            F.expr(f"(score_bp * {damping_bp}) div (10000 * __outdeg)").alias(
                "__c"
            ),
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = nt.join(summed, "node", "left").select(
            "node",
            (F.col("__tele") + F.coalesce(F.col("__s"), F.lit(0)))
            .cast("long")
            .alias("score_bp"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    ranks = ranks.localCheckpoint(eager=True)
    nt.unpersist()
    ed.unpersist()
    return ranks
