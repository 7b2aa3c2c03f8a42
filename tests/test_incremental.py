"""Incremental view maintenance ≡ full recompute; replay double-counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.incremental import (
    daily_user_partials,
    merge_partials,
    serve_daily_volume,
)
from kafka_bigdata_jobs_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _by_day(df):
    return {
        r["day"]: (r["n_events"], r["uniq_users"], r["value_cents"], r["n_purchases"])
        for r in df.collect()
    }


def test_incremental_merge_equals_full_recompute(spark):
    ev = load_table(spark, SF, "events")
    cut = "2024-01-20"
    hist = ev.where(F.col("ts").cast("date") < cut)
    late = ev.where(F.col("ts").cast("date") >= cut)

    state = daily_user_partials(hist)
    merged = merge_partials(state, daily_user_partials(late))
    incremental = serve_daily_volume(merged)
    full = serve_daily_volume(daily_user_partials(ev))
    assert _by_day(incremental) == _by_day(full)


def test_overlapping_day_deltas_merge_exactly(spark):
    """A delta that adds MORE rows to an already-present (day, user)
    cell must merge additively, not replace."""
    ev = load_table(spark, SF, "events")
    # Split interleaved by event_id so most (day, user) cells appear in both.
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = merge_partials(daily_user_partials(a), daily_user_partials(b))
    assert _by_day(serve_daily_volume(merged)) == _by_day(
        serve_daily_volume(daily_user_partials(ev))
    )


def test_replayed_delta_double_counts(spark):
    """Additive merge is NOT idempotent — replaying a delta inflates
    counts.  This pins the exactly-once-upstream requirement."""
    ev = load_table(spark, SF, "events")
    p = daily_user_partials(ev)
    doubled = serve_daily_volume(merge_partials(p, p))
    once = serve_daily_volume(p)
    d1, d2 = _by_day(once), _by_day(doubled)
    assert all(d2[k][0] == 2 * d1[k][0] for k in d1)


def test_streaming_incremental_view_equals_batch(spark, tmp_path):
    """File-stream micro-batches folded through IncrementalViewSink ==
    one-shot batch recompute (continuous-aggregate duality)."""
    from kafka_bigdata_jobs_spark.streaming.runner import (
        IncrementalViewSink,
        run_multi_sink,
    )

    ev = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "stream_src")
    # Four files -> four in-order micro-batches (maxFilesPerTrigger=1).
    for i in range(4):
        ev.where(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    state_dir = str(tmp_path / "mv_state")
    sink = IncrementalViewSink(
        state_dir=state_dir,
        partials_fn=daily_user_partials,
        merge_fn=merge_partials,
    )
    q = run_multi_sink(stream, [sink], checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    served = serve_daily_volume(spark.read.parquet(state_dir))
    full = serve_daily_volume(daily_user_partials(ev))
    assert _by_day(served) == _by_day(full)


def test_streaming_incremental_view_crash_replay(spark, tmp_path):
    """Kill the query mid-batch (sink raises AFTER computing the delta,
    BEFORE the swap completes on its first attempt), restart from the
    same checkpoint: the replayed micro-batch folds exactly once —
    atomic state swap + checkpoint replay = effectively-once."""
    from kafka_bigdata_jobs_spark.streaming.runner import (
        IncrementalViewSink,
        run_multi_sink,
    )

    ev = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "src")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    state_dir = str(tmp_path / "state")
    inner = IncrementalViewSink(
        state_dir=state_dir,
        partials_fn=daily_user_partials,
        merge_fn=merge_partials,
    )
    crashed = {"done": False}

    def crashing_sink(batch, batch_id):
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before state swap")
        inner(batch, batch_id)

    def make_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    ckpt = str(tmp_path / "ckpt")
    q = run_multi_sink(make_stream(), [crashing_sink], checkpoint=ckpt)
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # the injected crash surfaces as StreamingQueryException
    assert crashed["done"]

    # Restart from the SAME checkpoint; batch 1 replays, then batch 2.
    q2 = run_multi_sink(make_stream(), [inner], checkpoint=ckpt)
    q2.awaitTermination(120)

    served = serve_daily_volume(spark.read.parquet(state_dir))
    full = serve_daily_volume(daily_user_partials(ev))
    assert _by_day(served) == _by_day(full)


def test_streaming_incremental_view_crash_after_swap(spark, tmp_path):
    """foreachBatch is at-least-once: crash AFTER the state swap
    completes but BEFORE Spark commits the checkpoint offset.  The
    replayed micro-batch hits the POST-swap state; without batch_id
    idempotence the additive merge would double-count it (ADVICE r1,
    high).  The persisted ``_last_batch`` marker makes the replay a
    no-op."""
    from kafka_bigdata_jobs_spark.streaming.runner import (
        IncrementalViewSink,
        run_multi_sink,
    )

    ev = load_table(spark, SF, "events")
    src_dir = str(tmp_path / "src")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    state_dir = str(tmp_path / "state")
    inner = IncrementalViewSink(
        state_dir=state_dir,
        partials_fn=daily_user_partials,
        merge_fn=merge_partials,
    )
    crashed = {"done": False}

    def crash_after_swap(batch, batch_id):
        inner(batch, batch_id)  # swap COMPLETES
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after state swap")

    def make_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    ckpt = str(tmp_path / "ckpt")
    q = run_multi_sink(make_stream(), [crash_after_swap], checkpoint=ckpt)
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    assert crashed["done"]

    # Restart: batch 1 REPLAYS against state that already folded it.
    q2 = run_multi_sink(make_stream(), [inner], checkpoint=ckpt)
    q2.awaitTermination(120)

    served = serve_daily_volume(spark.read.parquet(state_dir))
    full = serve_daily_volume(daily_user_partials(ev))
    assert _by_day(served) == _by_day(full)
