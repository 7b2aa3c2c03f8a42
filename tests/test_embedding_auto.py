"""Size-dispatched exact embedding pair search (r5 verdict item 1).

``embedding_near_dup_pairs_auto`` must produce IDENTICAL output on both
sides of the ``max_side_bytes`` cutover: the numpy-blocked matmul path
below it, the cell-partitioned (k-means + covering-radius
multi-assignment) path above it.  The celled path's completeness is a
theorem (triangle inequality on sphere angles — see the operator
docstring); these tests check the implementation against the
brute-force upper-triangle join bit-for-bit, including on synthetic
data engineered so qualifying pairs STRADDLE cell boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from kafka_bigdata_jobs_spark.operators.similarity import (
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_auto,
    embedding_near_dup_pairs_celled,
    embedding_near_dup_pairs_hier,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df) -> list[tuple]:
    return sorted((r["id_a"], r["id_b"], r["cosine"]) for r in df.collect())


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.mark.parametrize("threshold", [0.45, 0.9])
def test_celled_matches_bruteforce_fixture(spark, emb, threshold):
    brute = _pairs(embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=threshold))
    celled = _pairs(embedding_near_dup_pairs_celled(
        emb, "vec_id", "embedding", threshold=threshold, n_cells=8))
    assert celled == brute


@pytest.mark.parametrize("threshold", [0.45, 0.9])
def test_hier_matches_bruteforce_fixture(spark, emb, threshold):
    brute = _pairs(embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=threshold))
    hier = _pairs(embedding_near_dup_pairs_hier(
        emb, "vec_id", "embedding", threshold=threshold))
    assert hier == brute


def test_auto_identical_output_across_cutover(spark, emb):
    """The dispatch decision must be invisible in the result: force each
    path via max_side_bytes and compare against brute force."""
    brute = _pairs(embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.45))
    below = _pairs(embedding_near_dup_pairs_auto(
        emb, "vec_id", "embedding", threshold=0.45,
        max_side_bytes=1 << 30))
    assert embedding_near_dup_pairs_auto.last_path == "blocked"
    above = _pairs(embedding_near_dup_pairs_auto(
        emb, "vec_id", "embedding", threshold=0.45, max_side_bytes=1))
    assert embedding_near_dup_pairs_auto.last_path == "hier"
    forced_flat = _pairs(embedding_near_dup_pairs_auto(
        emb, "vec_id", "embedding", threshold=0.45, max_side_bytes=1,
        n_cells=8))
    assert embedding_near_dup_pairs_auto.last_path == "celled"
    assert below == brute
    assert above == brute
    assert forced_flat == brute


def test_celled_complete_on_boundary_straddling_pairs(spark):
    """Synthetic stress: tight planted near-dup pairs whose members sit
    in DIFFERENT k-means cells unless the covering-radius replication
    works.  Two broad arcs of points with planted pairs at the arc
    boundary; many more cells than arcs so the quantizer is forced to
    split arcs mid-way."""
    rng = np.random.default_rng(7)
    dim, n_background, n_planted = 8, 240, 30
    rows = []
    vid = 0
    # background: points spread over two half-spaces
    for _ in range(n_background):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
        vid += 1
    # planted: pairs at angle ~10 degrees (cos ~0.985), random placement
    for _ in range(n_planted):
        a = rng.normal(size=dim)
        a /= np.linalg.norm(a)
        # random small rotation: mix with an orthogonalized direction
        d = rng.normal(size=dim)
        d -= d.dot(a) * a
        d /= np.linalg.norm(d)
        ang = np.deg2rad(10)
        b = np.cos(ang) * a + np.sin(ang) * d
        rows.append((vid, [float(x) for x in a])); vid += 1
        rows.append((vid, [float(x) for x in b])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = _pairs(embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))
    assert len(brute) >= n_planted  # the planted pairs qualify
    celled = _pairs(embedding_near_dup_pairs_celled(
        df, "vec_id", "embedding", threshold=0.97, dim=dim, n_cells=12))
    assert celled == brute
    hier = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim, leaf_target=24))
    assert hier == brute


def test_hier_zero_vector_does_not_poison_radii(spark):
    """A zero-norm vector in a cell used to make that cell's covering
    radius NaN, silently losing the cell's REAL pairs — now it is
    excluded up front (output-equivalent: its cosine is NaN and can
    never qualify in either engine)."""
    rng = np.random.default_rng(3)
    dim = 8
    rows = []
    for vid in range(60):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
    # planted twin pair + a zero vector
    rows.append((100, rows[0][1]))
    rows.append((101, [0.0] * dim))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = _pairs(embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.99, dim=dim))
    assert (0, 100, 1.0) in brute
    for fn, kw in ((embedding_near_dup_pairs_celled, {"n_cells": 6}),
                   (embedding_near_dup_pairs_hier, {"leaf_target": 10})):
        got = _pairs(fn(df, "vec_id", "embedding", threshold=0.99, dim=dim, **kw))
        assert got == brute


def _clustered_corpus(rng, n_clusters, per_cluster, dim, width_deg=8.0,
                      antipodal_spread=True):
    """Unit vectors in tight content clusters (the SemDeDup-class
    workload the hier path exists for)."""
    rows, vid = [], 0
    for _ in range(n_clusters):
        c = rng.normal(size=dim)
        c /= np.linalg.norm(c)
        for _ in range(per_cluster):
            d = rng.normal(size=dim)
            d -= d.dot(c) * c
            d /= np.linalg.norm(d)
            phi = np.deg2rad(width_deg * rng.random())
            v = np.cos(phi) * c + np.sin(phi) * d
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_hier_three_level_supers_bit_equal(spark):
    """r6 verdict item 1: with enough branches the SUPER level must
    activate (last_levels == 3) and the output must stay bit-identical
    to the numpy-blocked exact path — the same contract the x1 probe
    gate enforces at 50k rows, pinned here at unit-test scale.
    leaf_target=4 over 3000 rows yields ~750 leaves → ~165 branches →
    ~36 supers, so every three-level code path (super scan, probed-
    branch merge, super-radius replication prune) executes."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked,
    )

    rng = np.random.default_rng(11)
    dim = 8
    rows = _clustered_corpus(rng, n_clusters=60, per_cluster=50, dim=dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = _pairs(embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))
    assert len(blocked) > 0  # in-cluster pairs qualify by construction
    hier = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim, leaf_target=4))
    assert embedding_near_dup_pairs_hier.last_levels == 3
    assert hier == blocked


def test_replication_guard_trips_on_structureless_corpus(spark):
    """r6 verdict item 2: uniform high-dim noise at a θ_t that rivals
    the data's own angular spread degenerates the exact pair search
    toward all-pairs; the guard must fail loudly BEFORE the pair
    matmul, naming the approximate alternatives — not fill the disk
    (the r6 probe incidents)."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        CoveringRadiusBlowupError,
        embedding_near_dup_pairs_celled,
    )

    rng = np.random.default_rng(5)
    dim, n = 16, 3000
    rows = []
    for vid in range(n):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(CoveringRadiusBlowupError, match="replication factor"):
        embedding_near_dup_pairs_hier(
            df, "vec_id", "embedding", threshold=0.7, dim=dim,
            leaf_target=16, guard_min_rows=0)
    with pytest.raises(CoveringRadiusBlowupError, match="all-pairs"):
        embedding_near_dup_pairs_celled(
            df, "vec_id", "embedding", threshold=0.7, dim=dim,
            n_cells=64, guard_min_rows=0)


def test_replication_guard_passes_clustered_corpus(spark):
    """The guard must NOT trip on the workload the operator exists for:
    tight content clusters keep the measured replication factor far
    under the ceiling, and the guarded run still returns the exact
    output (the cached replica relation is REUSED, not recomputed)."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked,
    )

    rng = np.random.default_rng(13)
    dim = 8
    rows = _clustered_corpus(rng, n_clusters=40, per_cluster=40, dim=dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = _pairs(embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))
    hier = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim,
        leaf_target=8, guard_min_rows=0))
    assert hier == blocked
    rep = embedding_near_dup_pairs_hier.last_replication
    assert rep is not None and rep < 32.0, (
        f"clustered corpus measured replication {rep} — the guard "
        "would reject the operator's own workload")


def test_hier_fit_sample_covers_file_tail(spark, monkeypatch):
    """Regression (r6): the fit sample must be ORDER-INDEPENDENT.

    The original hier fit used ``.sample(frac).limit(cap)`` — ``limit``
    keeps the first rows in FILE ORDER, so on a corpus written in
    content-cluster order the tail clusters contributed zero fit
    points.  Their members then homed ~90° away and poisoned those
    leaves' covering radii: measured on the 500k-row probe corpus, the
    last 24 of 500 clusters went unsampled and the mean replication
    factor exploded from 9 to 210 (a ~55 GB shuffle that filled the
    host disk).  Output stayed bit-exact — the failure is quadratic
    COST, which no correctness gate sees — so this pins the sample
    itself: fit input must include rows from the corpus tail.

    The corpus here has two well-separated clusters written in order;
    the second (tail) cluster is the last 3% of rows — smaller than the
    ~4.7% file-order window the biased sampler drops (cap/expected =
    1/1.05), so under the old code the captured sample contains ZERO
    tail rows (verified by inverting this assert against it); the
    unbiased sampler carries ~3%.
    """
    import kafka_bigdata_jobs_spark.operators.similarity as sim

    rng = np.random.default_rng(7)
    n, dim = 4000, 8
    c1 = rng.normal(size=dim); c1 /= np.linalg.norm(c1)
    c2 = -c1  # antipodal: no fit point of cluster 1 is near cluster 2
    rows = []
    for i in range(n):
        c = c1 if i < 0.97 * n else c2
        d = rng.normal(size=dim); d -= d.dot(c) * c; d /= np.linalg.norm(d)
        phi = np.deg2rad(5 + 10 * rng.random())
        v = np.cos(phi) * c + np.sin(phi) * d
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    df = df.coalesce(1).sortWithinPartitions("vec_id")  # file order = cluster order

    captured = {}
    real_fit = sim._fit_two_level

    def spy(sample_mat, k_leaf, n_branches, seed):
        captured["sample"] = np.asarray(sample_mat)
        return real_fit(sample_mat, k_leaf, n_branches, seed)

    monkeypatch.setattr(sim, "_fit_two_level", spy)
    embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.95, dim=dim,
        fit_sample_rows=512).count()
    sample = captured["sample"]
    # tail-cluster membership: closer to c2 than c1
    tail = (sample @ c2) > (sample @ c1)
    frac = tail.mean()
    assert len(sample) <= 512
    assert 0.005 <= frac, (
        f"fit sample carries {frac:.1%} tail-cluster rows — the sampler "
        "is file-order biased again (expected ~3%)")


def test_replication_strategies_bit_equal(spark):
    """r7 verdict item 2: pass 2 dispatches between the flat n×B
    branch scan ('scan', pure GEMM, default below
    REPLICATION_SCAN_MAX_BRANCHES) and the home-conditioned candidate
    leaf lists ('cand', n-linear, no B term, the >50M-row form).  Both
    must produce the SAME output as the numpy-blocked exact path — the
    candidate lists are a sound superset of every branch admit, so the
    replica relation is identical by construction; this pins it."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked,
    )

    rng = np.random.default_rng(17)
    dim = 8
    rows = _clustered_corpus(rng, n_clusters=50, per_cluster=40, dim=dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = _pairs(embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))
    assert len(blocked) > 0
    got = {}
    for strat in ("scan", "cand"):
        got[strat] = _pairs(embedding_near_dup_pairs_hier(
            df, "vec_id", "embedding", threshold=0.97, dim=dim,
            leaf_target=6, replication_strategy=strat))
        assert (embedding_near_dup_pairs_hier.last_replication_strategy
                == strat)
        assert got[strat] == blocked
    # auto resolves to 'scan' at this branch count
    auto = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim,
        leaf_target=6))
    assert embedding_near_dup_pairs_hier.last_replication_strategy == "scan"
    assert auto == blocked


def test_distributed_fit_bit_equal_and_k_tracks_n(spark, monkeypatch):
    """r7 verdict item 1: the two-stage executor-side leaf fit must
    (a) produce the exact output (same covering-radius theorem — fit
    choice is quality-only, every pair is exact-verified), and
    (b) keep K tracking n/leaf_target where the DRIVER fit's sample
    cap would clamp it.  The cap is monkeypatched down so the unit
    corpus sits 'past the ceiling' the same way a 100M-row corpus
    sits past the real 1M-row cap."""
    import kafka_bigdata_jobs_spark.operators.similarity as sim
    from kafka_bigdata_jobs_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked,
    )

    rng = np.random.default_rng(23)
    dim = 8
    rows = _clustered_corpus(rng, n_clusters=60, per_cluster=50, dim=dim)
    n = len(rows)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = _pairs(embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))
    assert len(blocked) > 0

    # forced distributed, real cap: bit-equal output
    dist = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim,
        leaf_target=6, fit_mode="distributed"))
    assert embedding_near_dup_pairs_hier.last_fit_mode == "distributed"
    assert dist == blocked

    # past-the-ceiling regime: driver fit clamps K, auto goes
    # distributed and K keeps tracking n/leaf_target
    monkeypatch.setattr(sim, "FIT_SAMPLE_ROWS_CAP", 256)
    drv = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim,
        leaf_target=6, fit_mode="driver", fit_sample_rows=64))
    assert embedding_near_dup_pairs_hier.last_fit_mode == "driver"
    k_driver = embedding_near_dup_pairs_hier.last_k
    assert drv == blocked  # clamped K hurts cost, never correctness
    auto = _pairs(embedding_near_dup_pairs_hier(
        df, "vec_id", "embedding", threshold=0.97, dim=dim,
        leaf_target=6, fit_mode="auto", fit_sample_rows=64))
    assert embedding_near_dup_pairs_hier.last_fit_mode == "distributed"
    k_dist = embedding_near_dup_pairs_hier.last_k
    assert auto == blocked
    # the cap clamped the driver fit's K to ~cap/4 (±per-branch
    # rounding in _fit_two_level's proportional leaf allocation)
    assert k_driver <= int(1.25 * 256 // 4)
    assert k_dist >= 2 * k_driver, (
        f"distributed fit K={k_dist} does not track n/leaf_target="
        f"{n // 6} past the (patched) driver cap (driver K={k_driver})")


def test_on_blowup_fallback_routes_to_semdedup(spark):
    """r7 verdict item 5: an unattended 100-TB pipeline wants graceful
    degradation, not death at hour N.  on_blowup='fallback' must
    (a) on a structureless corpus: catch the guard's named error,
    route to the APPROXIMATE SemDeDup within-cell pair search, tag
    rows method='semdedup_cells', and produce exactly the within-cell
    path's output; (b) on clustered data: NEVER activate — the exact
    path runs and rows say method='exact'."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        CoveringRadiusBlowupError,
        kmeans_ivf_cells,
    )

    # (a) structureless: uniform high-dim noise at a threshold that
    # rivals its angular spread (same corpus family as the guard test)
    rng = np.random.default_rng(29)
    dim, n = 16, 3000
    rows = []
    for vid in range(n):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
    noise = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    # raise mode: the named error propagates (the default contract)
    with pytest.raises(CoveringRadiusBlowupError):
        embedding_near_dup_pairs_auto(
            noise, "vec_id", "embedding", threshold=0.7, dim=dim,
            max_side_bytes=1, guard_min_rows=0, max_replication=2.0)
    got = embedding_near_dup_pairs_auto(
        noise, "vec_id", "embedding", threshold=0.7, dim=dim,
        max_side_bytes=1, guard_min_rows=0, max_replication=2.0,
        on_blowup="fallback")
    assert embedding_near_dup_pairs_auto.last_path == "semdedup_fallback"
    assert embedding_near_dup_pairs_auto.last_method == "semdedup_cells"
    assert got.columns == ["id_a", "id_b", "cosine", "method"]
    got_rows = {(r["id_a"], r["id_b"], r["cosine"]) for r in got.collect()}
    assert {r["method"] for r in got.select("method").distinct().collect()
            } <= {"semdedup_cells"}
    # the fallback must BE the SemDeDup within-cell path's output
    fb_cells = max(16, min(4096, n // 256))
    assigned, _ = kmeans_ivf_cells(
        noise, "vec_id", "embedding", n_cells=fb_cells, seed=42, dim=dim)
    want = {(r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dup_pairs(
                assigned, "vec_id", "embedding", threshold=0.7,
                cell_col="__cell", dim=dim).collect()}
    assert got_rows == want

    # (b) clustered: fallback never silently activates
    rng2 = np.random.default_rng(31)
    crows = _clustered_corpus(rng2, n_clusters=40, per_cluster=40, dim=8)
    cdf = spark.createDataFrame(
        crows, "vec_id long, embedding array<double>")
    brute = _pairs(embedding_near_dup_pairs(
        cdf, "vec_id", "embedding", threshold=0.97, dim=8))
    res = embedding_near_dup_pairs_auto(
        cdf, "vec_id", "embedding", threshold=0.97, dim=8,
        max_side_bytes=1, guard_min_rows=0, on_blowup="fallback")
    assert embedding_near_dup_pairs_auto.last_method == "exact"
    assert res.columns == ["id_a", "id_b", "cosine", "method"]
    assert _pairs(res.drop("method")) == brute


def test_exact_home_prepare_matches_inline_build():
    """r9 esc-cap fix: the executor scan hoists the quantizer-derived
    state (``_exact_home_prepare``) once per task instead of rebuilding
    it per Arrow batch.  Pin that (a) the hoisted state produces
    BIT-IDENTICAL exact home angles to the build-inline form, and
    (b) the argsort-based ``leaves_of`` equals the per-branch nonzero
    lists it replaced — including leafless (dead) branches."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        _exact_home_angles,
        _exact_home_prepare,
    )

    rng = np.random.default_rng(7)
    dim, n_b, k = 16, 13, 61
    bcenters = rng.normal(size=(n_b, dim))
    bcenters /= np.linalg.norm(bcenters, axis=1, keepdims=True)
    leaf_centers = rng.normal(size=(k, dim))
    leaf_centers /= np.linalg.norm(leaf_centers, axis=1, keepdims=True)
    # branch 5 deliberately leafless (dead-branch path)
    leaf_branch = np.array(
        [b for b in (rng.integers(0, n_b, size=k)) if True], dtype=np.int64)
    leaf_branch[leaf_branch == 5] = 6
    mat = rng.normal(size=(500, dim))

    prep = _exact_home_prepare(bcenters, leaf_centers, leaf_branch)
    # (b) leaves_of == the nonzero form, ascending per branch
    leaves_of = prep[1]
    for b in range(n_b):
        assert np.array_equal(
            leaves_of[b], np.nonzero(leaf_branch == b)[0]), b
    # (a) angles identical with and without the hoisted state
    got = _exact_home_angles(mat, bcenters, leaf_centers, leaf_branch,
                             prep=prep)
    want = _exact_home_angles(mat, bcenters, leaf_centers, leaf_branch)
    assert np.array_equal(got, want)
    # sanity: every angle is the true full-leaf exact minimum
    xn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    brute = np.arccos(np.clip((xn @ leaf_centers.T).max(axis=1), -1, 1))
    assert np.allclose(got, brute, atol=1e-12)


def test_tail_partition_floor_binds_only_at_scale():
    """r10 VERDICT item 4: the hier tail's leaf-exchange partition
    floor must (a) keep bench-scale plans untouched (None — the
    unfloored repartition), (b) bound the per-task tagged bytes at
    scale, and (c) stay None when the guard was skipped."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        LEAF_PART_TARGET_BYTES,
        TAGGED_ROW_OVERHEAD_BYTES,
        _tail_partition_floor,
    )

    # guard skipped (small corpus) -> no floor
    assert _tail_partition_floor(10_000, None, 64, 200) is None
    # probe-scale corpus (x100: 5M rows, rep ~9, dim 64): tagged bytes
    # ~8 GB << 200 x 128 MB -> default partitioning preserved
    assert _tail_partition_floor(5_000_000, 9.0, 64, 200) is None
    # 100x that corpus: floor binds, and bounds per-task bytes
    n, rep, dim, parts = 500_000_000, 9.0, 64, 200
    got = _tail_partition_floor(n, rep, dim, parts)
    assert got is not None and got > parts
    bytes_tagged = int(n * (1 + rep)) * (dim * 2 + TAGGED_ROW_OVERHEAD_BYTES)
    assert bytes_tagged / got <= LEAF_PART_TARGET_BYTES
    # and the floor is tight (no over-partitioning): one fewer
    # partition would exceed the target
    assert bytes_tagged / (got - 1) > LEAF_PART_TARGET_BYTES


def test_guard_recount_mode_bit_equal(spark, monkeypatch):
    """r10 VERDICT item 1: guard_mode='recount' (payload-free count
    twin + tail recompute, no replica cache) must measure the SAME
    replication factor and return the SAME pairs as the cached form,
    and must still trip on structureless corpora."""
    from kafka_bigdata_jobs_spark.operators.similarity import (
        CoveringRadiusBlowupError,
        embedding_near_dup_pairs_blocked,
    )

    rng = np.random.default_rng(13)
    dim = 8
    rows = _clustered_corpus(rng, n_clusters=40, per_cluster=40, dim=dim)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = _pairs(embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.97, dim=dim))

    def run():
        got = _pairs(embedding_near_dup_pairs_hier(
            df, "vec_id", "embedding", threshold=0.97, dim=dim,
            leaf_target=8, guard_min_rows=0))
        return got, embedding_near_dup_pairs_hier.last_replication

    monkeypatch.delenv("SPARK_GRAFT_GUARD_MODE", raising=False)
    cached_pairs, cached_rep = run()
    monkeypatch.setenv("SPARK_GRAFT_GUARD_MODE", "recount")
    spark.catalog.clearCache()
    recount_pairs, recount_rep = run()
    assert recount_pairs == cached_pairs == blocked
    assert recount_rep == pytest.approx(cached_rep, rel=0, abs=0)

    # blowup still trips BEFORE the tail in recount mode
    noise = []
    rng2 = np.random.default_rng(5)
    for vid in range(3000):
        v = rng2.normal(size=16)
        noise.append((vid, [float(x) for x in v / np.linalg.norm(v)]))
    ndf = spark.createDataFrame(noise,
                                "vec_id long, embedding array<double>")
    with pytest.raises(CoveringRadiusBlowupError, match="replication factor"):
        embedding_near_dup_pairs_hier(
            ndf, "vec_id", "embedding", threshold=0.7, dim=16,
            leaf_target=16, guard_min_rows=0)
