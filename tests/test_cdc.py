"""apply_changelog / delta_join vs pure-Python replay twins.

The CDC apply and the join-IVM algebra are both closed-form enough to
replay in plain dicts; fuzzing seeded random snapshots/changelogs
against the replay pins last-wins ordering, tombstone semantics,
insert-via-update, and the three-term delta-join identity without
trusting any Spark machinery twice.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_bigdata_jobs_spark.operators.cdc import apply_changelog
from kafka_bigdata_jobs_spark.operators.incremental import delta_join

SNAP_SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("status", StringType(), True),
        StructField("val", LongType(), True),
    ]
)

LOG_SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("seq", LongType(), False),
        StructField("op", StringType(), False),
        StructField("status", StringType(), True),
        StructField("val", LongType(), True),
    ]
)


def _replay(snapshot, changelog):
    """Pure-Python truth: latest seq per key wins, D deletes, U upserts."""
    state = {k: (s, v) for k, s, v in snapshot}
    latest: dict[int, tuple[int, str, str | None, int | None]] = {}
    for k, seq, op, s, v in changelog:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op, s, v)
    for k, (_, op, s, v) in latest.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (s, v)
    return sorted((k, s, v) for k, (s, v) in state.items())


def _apply_spark(spark, snapshot, changelog):
    snap = spark.createDataFrame(snapshot, SNAP_SCHEMA)
    log = spark.createDataFrame(changelog, LOG_SCHEMA)
    out = apply_changelog(snap, log, keys=["k"], seq_col="seq", op_col="op")
    return sorted((r.k, r.status, r.val) for r in out.collect())


def test_update_insert_delete_basic(spark):
    snapshot = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    changelog = [
        (2, 1, "U", "B", 99),  # replace existing
        (4, 1, "U", "d", 40),  # insert new key
        (3, 1, "D", None, None),  # tombstone
        (9, 1, "D", None, None),  # delete of absent key: no-op
    ]
    assert _apply_spark(spark, snapshot, changelog) == _replay(
        snapshot, changelog
    ) == [(1, "a", 10), (2, "B", 99), (4, "d", 40)]


def test_last_wins_ordering(spark):
    snapshot = [(1, "a", 10)]
    changelog = [
        (1, 3, "U", "late", 3),
        (1, 1, "D", None, None),
        (1, 2, "U", "mid", 2),
        (2, 1, "U", "x", 1),
        (2, 2, "D", None, None),  # insert-then-delete: never appears
    ]
    assert _apply_spark(spark, snapshot, changelog) == [(1, "late", 3)]


def test_empty_changelog_is_identity(spark):
    snapshot = [(1, "a", 10), (2, "b", 20)]
    assert _apply_spark(spark, snapshot, []) == sorted(snapshot)


def test_fuzz_vs_replay(spark):
    rng = random.Random(20260815)
    for trial in range(5):
        keys = range(1, 40)
        snapshot = [
            (k, rng.choice("abc"), rng.randrange(1000))
            for k in keys
            if rng.random() < 0.7
        ]
        changelog = []
        seq_by_key: dict[int, int] = {}
        for _ in range(rng.randrange(10, 60)):
            k = rng.randrange(1, 50)
            seq_by_key[k] = seq_by_key.get(k, 0) + 1  # unique per key
            if rng.random() < 0.25:
                changelog.append((k, seq_by_key[k], "D", None, None))
            else:
                changelog.append(
                    (k, seq_by_key[k], "U", rng.choice("xyz"), rng.randrange(1000))
                )
        rng.shuffle(changelog)
        assert _apply_spark(spark, snapshot, changelog) == _replay(
            snapshot, changelog
        ), f"trial {trial}"


def test_delta_join_reconstitutes_full_join(spark):
    """old⋈old ∪ delta_join(...) must equal new⋈new exactly —
    multiset equality, so no pair is lost or double-counted."""
    rng = random.Random(7)
    a_rows = [(rng.randrange(10), i) for i in range(60)]
    b_rows = [(rng.randrange(10), 100 + i) for i in range(60)]
    a = spark.createDataFrame(a_rows, "key: long, av: long")
    b = spark.createDataFrame(b_rows, "key: long, bv: long")
    a_old, a_new = a.where(F.col("av") % 3 != 0), a.where(F.col("av") % 3 == 0)
    b_old, b_new = b.where(F.col("bv") % 4 != 0), b.where(F.col("bv") % 4 == 0)

    full = sorted(
        (r.key, r.av, r.bv) for r in a.join(b, "key").collect()
    )
    stored = a_old.join(b_old, "key")
    maintained = stored.unionByName(
        delta_join(a_old, a_new, b_old, b_new, on=["key"])
    )
    got = sorted((r.key, r.av, r.bv) for r in maintained.collect())
    assert got == full


def test_delta_join_signed_nets_exact_multiset(spark):
    """Stored(old⋈old, w=+1) ∪ signed delta, summed per row-value, must
    equal the post-change join's multiset — including rows whose A-side
    AND B-side retract in the same batch (the ΔA⋈ΔB cross term)."""
    from collections import Counter

    from kafka_bigdata_jobs_spark.operators.incremental import delta_join_signed

    rng = random.Random(11)
    a_rows = [(rng.randrange(8), i) for i in range(50)]
    b_rows = [(rng.randrange(8), 100 + i) for i in range(50)]
    a = spark.createDataFrame(a_rows, "key: long, av: long")
    b = spark.createDataFrame(b_rows, "key: long, bv: long")
    a_old = a.where(F.col("av") % 3 != 0)
    b_old = b.where(F.col("bv") % 4 != 0)
    # Inserts: the held-out thirds/fourths.  Retractions: slices of the
    # OLD sides — %5 on A and %6 on B overlap on shared keys, so some
    # pairs lose both sides in one batch.
    da = (
        a.where(F.col("av") % 3 == 0)
        .withColumn("__w", F.lit(1))
        .unionByName(a_old.where(F.col("av") % 5 == 0).withColumn("__w", F.lit(-1)))
    )
    db = (
        b.where(F.col("bv") % 4 == 0)
        .withColumn("__w", F.lit(1))
        .unionByName(b_old.where(F.col("bv") % 6 == 0).withColumn("__w", F.lit(-1)))
    )
    a_new = [(k, v) for k, v in a_rows if v % 3 == 0 or v % 5 != 0]
    b_new = [(k, v) for k, v in b_rows if v % 4 == 0 or v % 6 != 0]
    expect = Counter(
        (k, av, bv) for k, av in a_new for k2, bv in b_new if k == k2
    )

    stored = a_old.join(b_old, "key").withColumn("__w", F.lit(1))
    folded = stored.unionByName(
        delta_join_signed(a_old, da, b_old, db, on=["key"])
    )
    got = Counter()
    for r in folded.collect():
        got[(r.key, r.av, r.bv)] += r["__w"]
    got = Counter({k: v for k, v in got.items() if v != 0})
    assert got == expect
    # sanity: the cross term actually fired (some pair retracted on both sides)
    both = [
        (k, av, bv)
        for k, av in a_rows
        if av % 3 != 0 and av % 5 == 0
        for k2, bv in b_rows
        if k == k2 and bv % 4 != 0 and bv % 6 == 0
    ]
    assert both, "fixture lost its double-retraction coverage"
