"""Storage-layout scale contracts: partition pruning and bucketed
(shuffle-free) joins — the two layout levers that matter most at
100 TB (SURVEY.md §4; SCALE.md)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.schemas import load_table
from kafka_bigdata_jobs_spark.sinks import write_bucketed_table, write_parquet

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    from tests.test_plan_quality import formatted_plan

    return formatted_plan(df)


def test_partitioned_write_prunes_on_read(spark):
    d = tempfile.mkdtemp(prefix="layout_part_")
    ev = load_table(spark, SF, "events")
    write_parquet(ev, d, partition_by=["event_type"])

    back = spark.read.parquet(d).where(F.col("event_type") == "purchase")
    plan = _plan(back)
    # The partition filter must hit the directory listing, not the rows.
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    n_purchase = ev.where(F.col("event_type") == "purchase").count()
    assert back.count() == n_purchase


def _drop_table(spark, name: str) -> None:
    """Drop a managed table AND its warehouse directory.

    A previous session's directory survives in spark-warehouse/ while
    the in-memory catalog starts empty, so saveAsTable would refuse the
    'existing' location — remove both."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def test_bucketed_join_needs_no_exchange(spark):
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    _drop_table(spark, "b_orders")
    _drop_table(spark, "b_lineitem")
    write_bucketed_table(o, "b_orders", ["o_orderkey"], num_buckets=4)
    write_bucketed_table(
        li, "b_lineitem", ["l_orderkey"], num_buckets=4, sort_by=["l_orderkey"]
    )

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # Force the sort-merge path (broadcast would hide the bucketing win).
    joined_smj = bl.hint("merge").join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = _plan(joined_smj)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join should be shuffle-free"

    # Correctness: same result as the plain parquet join.
    expect = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))


def test_bucketed_aggregation_needs_no_exchange(spark):
    try:
        spark.table("b_lineitem")
    except Exception:
        pytest.skip("bucketed table not available")
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, "groupBy on the bucket key should be shuffle-free"


def test_sorted_parquet_rowgroup_stats_disjoint(spark):
    """write_sorted_parquet must produce parquet whose row-group min/max
    stats are disjoint along the sort column, so a range predicate can
    skip most row groups (footer-level pruning).  Verified directly
    from the written footers with pyarrow."""
    import glob
    import os

    import pyarrow.parquet as pq

    from kafka_bigdata_jobs_spark.sinks import write_sorted_parquet

    ev = load_table(spark, SF, "events").select("event_id", "ts", "value")
    d = tempfile.mkdtemp(prefix="sorted_pq_") + "/ev"
    write_sorted_parquet(ev, d, ["ts"], num_files=4)

    ranges = []
    for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        ts_idx = md.schema.names.index("ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ts_idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 4
    ranges.sort()
    # file/row-group ranges must not interleave: each min >= previous max
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert lo2 >= hi1, f"overlapping row-group ranges {hi1} vs {lo2}"

    # and the sorted layout round-trips identically
    got = spark.read.parquet(d)
    assert got.count() == ev.count()


def test_zorder_parquet_prunes_both_columns(spark):
    """Z-order layout must let a narrow predicate on EITHER clustered
    column skip files (footer stats), where a single-column sort prunes
    only its own axis.  Asserted from the written parquet footers."""
    import os

    from kafka_bigdata_jobs_spark.operators.zorder import morton_filter_stats
    from kafka_bigdata_jobs_spark.sinks import write_sorted_parquet, write_zorder_parquet

    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
    )
    ulo, uhi, vlo, vhi = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("vc"), F.max("vc")
    ).first()
    u_band = (ulo + (uhi - ulo) * 2 // 5, ulo + (uhi - ulo) // 2)
    v_band = (vlo + (vhi - vlo) * 2 // 5, vlo + (vhi - vlo) // 2)

    base = tempfile.mkdtemp(prefix="zorder_pq_")
    zd = os.path.join(base, "z")
    sd = os.path.join(base, "s")
    write_zorder_parquet(ev, zd, "user_id", "vc", bits=8, num_files=16)
    write_sorted_parquet(ev, sd, ["user_id"], num_files=16)

    zu_hit, zu_tot = morton_filter_stats(zd + "/*.parquet", "user_id", *u_band)
    zv_hit, zv_tot = morton_filter_stats(zd + "/*.parquet", "vc", *v_band)
    su_hit, su_tot = morton_filter_stats(sd + "/*.parquet", "user_id", *u_band)
    sv_hit, sv_tot = morton_filter_stats(sd + "/*.parquet", "vc", *v_band)

    # z-order prunes on BOTH axes ...
    assert zu_hit < zu_tot, f"user axis unpruned: {zu_hit}/{zu_tot}"
    assert zv_hit < zv_tot, f"value axis unpruned: {zv_hit}/{zv_tot}"
    # ... single-column sort prunes its own axis but not the other
    assert su_hit < su_tot
    assert sv_hit == sv_tot, "control: user-sorted layout shouldn't prune value"

    # and the clustered copy is lossless
    got = spark.read.parquet(zd)
    assert got.count() == ev.count()
    n_band = ev.where(
        (F.col("user_id") >= u_band[0]) & (F.col("user_id") <= u_band[1])
    ).count()
    assert (
        got.where(
            (F.col("user_id") >= u_band[0]) & (F.col("user_id") <= u_band[1])
        ).count()
        == n_band
    )
