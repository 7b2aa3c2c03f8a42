"""Batch CSV sources (SURVEY §2.1 S4-S6) + external sink pattern (K2/K3)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.sources.batch import read_tweets_csv
from kafka_bigdata_jobs_spark.streaming.runner import BufferedExternalSink

HEADERLESS_ROWS = (
    'alice,"Lima, Peru",crypto fan,2020-01-01,100.0,50.0,10.0,true,'
    '2021-02-03 04:05:06,hello world,"[\'btc\']",Twitter Web App,false\n'
    "bob,,,2019-05-05,,,,false,2021-02-03 05:00:00,gm,,iPhone,true\n"
)


@pytest.fixture()
def csv_dir():
    d = tempfile.mkdtemp(prefix="tweets_csv_")
    with open(f"{d}/bitcoin.csv", "w") as f:
        f.write(HEADERLESS_ROWS)
    return d


def test_headerless_csv_declared_schema(spark, csv_dir):
    df = read_tweets_csv(spark, f"{csv_dir}/bitcoin.csv", crypto_type="bitcoin")
    rows = {r["user_name"]: r for r in df.collect()}
    assert rows["alice"]["user_location"] == "Lima, Peru"  # quoted comma survives
    assert rows["alice"]["user_followers"] == 100
    assert rows["alice"]["crypto_type"] == "bitcoin"
    assert dict(df.dtypes)["user_followers"] == "bigint"


def test_null_repair_defaults(spark, csv_dir):
    df = read_tweets_csv(spark, f"{csv_dir}/bitcoin.csv", crypto_type="bitcoin")
    bob = df.where(F.col("user_name") == "bob").first()
    assert bob["user_location"] == "Unknown"   # fillna default (S6)
    assert bob["user_followers"] == 0
    assert bob["hashtags"] == ""


def test_buffered_external_sink_chunks(spark):
    sent: list[list[dict]] = []
    sink = BufferedExternalSink(send=sent.append, chunk_size=3)
    batch = spark.range(8).withColumnRenamed("id", "doc_id")
    sink(batch, batch_id=0)
    assert [len(c) for c in sent] == [3, 3, 2]
    assert sent[0][0] == {"doc_id": 0}


def test_csv_rejects_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from kafka_bigdata_jobs_spark.sources.batch import read_csv_with_rejects

    p = tmp_path / "mixed.csv"
    p.write_text(
        "1,alice,10.5\n"
        "2,bob,notanumber\n"      # malformed double
        "3,carol,7.25\n"
        "4,dave\n"                # missing column -> null-filled, not corrupt
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, rejects = read_csv_with_rejects(spark, str(p), schema)
    good_rows = {r["id"]: r for r in good.collect()}
    bad = [r["raw_line"] for r in rejects.collect()]
    assert set(good_rows) >= {1, 3}
    assert good_rows[1]["score"] == 10.5
    assert any("notanumber" in line for line in bad)
    assert not any(c == "_corrupt_record" for c in good.columns)


def test_orc_and_jsonl_round_trip(spark):
    """Format completeness: the same frame survives ORC and JSON-lines
    round trips byte-exactly (timestamps pinned to UTC session TZ).
    Parquet is the primary format everywhere else in the suite."""
    import tempfile

    from kafka_bigdata_jobs_spark.schemas import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )
    want = ev.collect()

    d = tempfile.mkdtemp(prefix="fmt_rt_")
    ev.write.mode("overwrite").orc(d + "/orc")
    got_orc = spark.read.orc(d + "/orc").orderBy("event_id").collect()
    assert got_orc == want

    ev.write.mode("overwrite").json(d + "/jsonl")
    got_json = (
        spark.read.schema(ev.schema).json(d + "/jsonl").orderBy("event_id").collect()
    )
    assert got_json == want


def test_xml_round_trip(spark):
    """Spark 4 ships a native XML source (no external spark-xml jar):
    the same frame survives an XML round trip with an explicit read
    schema (XML infers everything as string otherwise)."""
    import tempfile

    from kafka_bigdata_jobs_spark.schemas import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )
    want = ev.collect()

    d = tempfile.mkdtemp(prefix="xml_rt_")
    ev.write.mode("overwrite").option("rowTag", "event").format("xml").save(d + "/xml")
    got = (
        spark.read.schema(ev.schema)
        .option("rowTag", "event")
        .format("xml")
        .load(d + "/xml")
        .orderBy("event_id")
        .collect()
    )
    assert got == want


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from kafka_bigdata_jobs_spark.sources.batch import read_jsonl

    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id": 1, "event_type": "click", "value": 1.5}\n'
        '{"event_id": 2, "event_type": "view", "value": 0.25}\n'
        "this is not json\n"
        '{"event_id": "NaN-ish", "event_type": 3, "value": []}\n'
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    good, rejects = read_jsonl(spark, str(p), schema)
    assert good.count() == 2
    assert [f.name for f in good.schema.fields] == [
        "event_id",
        "event_type",
        "value",
    ]
    bad = [r.raw_line for r in rejects.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_orc_roundtrip_prunes_and_pushes_down(spark, tmp_path):
    from pyspark.sql import functions as F

    from kafka_bigdata_jobs_spark.sources.batch import read_orc

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dst = str(tmp_path / "events_orc")
    src.write.mode("overwrite").orc(dst)

    back = read_orc(spark, dst, columns=["event_id", "event_type", "value"])
    assert back.count() == src.count()

    filtered = back.where(F.col("event_type") == "click")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # Column pruning: the scan must not read ts/user_id/props;
    # predicate pushdown: the event_type filter reaches the ORC scan.
    assert "props" not in plan.split("ReadSchema")[-1]
    assert "PushedFilters: [" in plan and "event_type" in plan.split(
        "PushedFilters"
    )[-1]

    a = sorted(map(tuple, src.select("event_id", "event_type").collect()))
    b = sorted(map(tuple, back.select("event_id", "event_type").collect()))
    assert a == b
