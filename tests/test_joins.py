"""Join-strategy unit tests (salted join equivalence, star join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators.joins import salted_join, star_join
from kafka_bigdata_jobs_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    users = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).withColumnRenamed(
            "user_id", "uid"
        )
    )
    plain = ev.join(users, ev["user_id"] == users["uid"]).select("event_id", "n")
    salted = salted_join(ev, users, "user_id", "uid", salt=4).select("event_id", "n")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_star_join_row_parity(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    part = load_table(spark, SF, "part").select("p_partkey")
    out = star_join(
        li,
        [
            (orders, F.col("l_orderkey") == F.col("o_orderkey")),
            (part, F.col("l_partkey") == F.col("p_partkey")),
        ],
    )
    assert out.count() == li.count()  # FK integrity: every lineitem matches
