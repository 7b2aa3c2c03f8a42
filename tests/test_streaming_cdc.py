"""Streaming CDC apply: change stream → continuously-current snapshot.

Drains a file-source changelog with ``availableNow`` through
``CdcApplySink`` (one file per micro-batch) and checks the final
parquet snapshot equals the sequential replay — including a stale
redelivery (lower seq than the state's high-water mark for its key)
that must be ignored, and a replayed batch_id that must no-op.
"""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_bigdata_jobs_spark.streaming.runner import CdcApplySink

LOG_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)

BATCH_1 = [(k, k, "U", "new", 10 * k) for k in range(1, 6)]  # seq 1..5
BATCH_2 = [
    (2, 6, "U", "upd", 99),     # update existing
    (3, 7, "D", None, None),    # tombstone
    (6, 8, "U", "new", 60),     # insert
    (1, 0, "U", "stale", -1),   # STALE: seq 0 < state high-water 1 → ignored
]

FINAL = {
    1: ("new", 10, 1),
    2: ("upd", 99, 6),
    4: ("new", 40, 4),
    5: ("new", 50, 5),
    6: ("new", 60, 8),
}


@pytest.fixture()
def changelog_dir(spark):
    d = tempfile.mkdtemp(prefix="cdc_stream_")
    for rows in (BATCH_1, BATCH_2):
        spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(1.1)  # distinct mod-times → deterministic batch order
    return d


def _read_state(spark, state_dir):
    return {
        r.k: (r.status, r.val, r["__seq"])
        for r in CdcApplySink.read_snapshot(spark, state_dir).collect()
    }


def test_stream_apply_matches_sequential_replay(spark, changelog_dir):
    state_dir = tempfile.mkdtemp(prefix="cdc_state_") + "/snap"
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    sink = CdcApplySink(state_dir=state_dir, keys=["k"])
    (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert _read_state(spark, state_dir) == FINAL


def test_replayed_batch_and_stale_row_are_noops(spark):
    state_dir = tempfile.mkdtemp(prefix="cdc_state2_") + "/snap"
    b1 = spark.createDataFrame(BATCH_1, LOG_SCHEMA)
    b2 = spark.createDataFrame(BATCH_2, LOG_SCHEMA)
    sink = CdcApplySink(state_dir=state_dir, keys=["k"])
    sink(b1, 0)
    sink(b2, 1)
    after = _read_state(spark, state_dir)
    assert after == FINAL
    # foreachBatch is at-least-once: the same batch_id must short-circuit.
    sink(b2, 1)
    assert _read_state(spark, state_dir) == after
    # And even with a FRESH batch_id, re-delivered rows are all stale
    # (seq <= high-water) — the per-key guard alone keeps state fixed.
    sink(b2.withColumn("seq", F.col("seq")), 2)
    assert _read_state(spark, state_dir) == after


def test_stale_update_after_delete_stays_deleted(spark):
    """ADVICE r3 (medium): a redelivered U older than a D must NOT
    resurrect the key — the tombstone retains the high-water mark."""
    state_dir = tempfile.mkdtemp(prefix="cdc_state3_") + "/snap"
    sink = CdcApplySink(state_dir=state_dir, keys=["k"])
    sink(spark.createDataFrame([(3, 2, "U", "orig", 30)], LOG_SCHEMA), 0)
    sink(spark.createDataFrame([(3, 7, "D", None, None)], LOG_SCHEMA), 1)
    assert _read_state(spark, state_dir) == {}
    # Redeliver the OLD update alone in a new batch (seq 2 < delete's 7).
    sink(spark.createDataFrame([(3, 2, "U", "orig", 30)], LOG_SCHEMA), 2)
    assert _read_state(spark, state_dir) == {}
    # A genuinely newer U (seq above the delete) re-creates the key.
    sink(spark.createDataFrame([(3, 9, "U", "back", 31)], LOG_SCHEMA), 3)
    assert _read_state(spark, state_dir) == {3: ("back", 31, 9)}


def test_crashed_swap_recovers_from_old_dir(spark):
    """ADVICE r3 (low): a crash between the two swap moves leaves only
    __old_* — the next call must restore it, not rebuild from empty."""
    import glob
    import pathlib
    import shutil

    state_dir = tempfile.mkdtemp(prefix="cdc_state4_") + "/snap"
    sink = CdcApplySink(state_dir=state_dir, keys=["k"])
    sink(spark.createDataFrame(BATCH_1, LOG_SCHEMA), 0)
    before = _read_state(spark, state_dir)
    assert before  # sanity: 5 keys
    # Simulate the crash window: state moved aside, next never moved in.
    shutil.move(state_dir, state_dir + "__old_deadbeef")
    pathlib.Path(state_dir + "__next_cafef00d").mkdir()
    # The redelivered batch reapplies on top of the RESTORED state.
    sink(spark.createDataFrame(BATCH_2, LOG_SCHEMA), 1)
    assert _read_state(spark, state_dir) == FINAL
    assert glob.glob(state_dir + "__old_*") == []
    assert glob.glob(state_dir + "__next_*") == []


def test_recovery_picks_old_dir_by_marker_not_name(spark):
    """ADVICE r4 (low): when TWO __old_* dirs coexist (a superseded dir
    survived a failed delete, then a later crash mid-swap left another),
    recovery must restore the one with the highest _last_batch marker —
    uuid-hex dir names sort arbitrarily, so lexicographic order can
    point at the stale dir and silently regress state."""
    import glob
    import shutil

    root = tempfile.mkdtemp(prefix="cdc_state5_")
    state_dir = root + "/snap"
    sink = CdcApplySink(state_dir=state_dir, keys=["k"])
    sink(spark.createDataFrame(BATCH_1, LOG_SCHEMA), 0)
    stale = _read_state(spark, state_dir)
    shutil.copytree(state_dir, root + "/stale_copy")  # batch-0 state, marker 0
    sink(spark.createDataFrame(BATCH_2, LOG_SCHEMA), 1)
    fresh = _read_state(spark, state_dir)
    assert fresh == FINAL and fresh != stale
    # Stale survivor under a name that sorts FIRST, current state moved
    # aside (crash mid-swap) under a name that sorts LAST: recovery must
    # pick by marker (1 > 0), not by lexicographic dir name.
    shutil.copytree(root + "/stale_copy", state_dir + "__old_0000stale")
    shutil.move(state_dir, state_dir + "__old_ffffcrash")
    sink(spark.createDataFrame(BATCH_2, LOG_SCHEMA), 2)  # redelivery
    assert _read_state(spark, state_dir) == FINAL
    assert glob.glob(state_dir + "__old_*") == []
