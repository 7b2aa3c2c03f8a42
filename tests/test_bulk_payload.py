"""OpenSearch ``_bulk`` payload conformance (r5 verdict item 4).

The reference posts documents one HTTP call per row
(``streaming/elk_sender.py:107-128``); the engine's
``BufferedExternalSink`` ships chunks — but until now its payloads were
only checked against a recording stub.  These tests pin the EXACT
bytes an OpenSearch/Elasticsearch ``_bulk`` endpoint requires:
action/source line alternation, compact JSON, the mandatory trailing
newline, ndjson content type, ``_id`` routing, and the value
conversions (isoformat datetimes — reference parity — plus base64
binary and NaN → null).  No cluster needed: the HTTP ``post`` boundary
is injected.
"""

from __future__ import annotations

import datetime
import json

from kafka_bigdata_jobs_spark.index_ddl import (
    make_opensearch_bulk_send,
    opensearch_bulk_payload,
)
from kafka_bigdata_jobs_spark.streaming.runner import BufferedExternalSink


def test_bulk_payload_exact_bytes():
    rows = [
        {"user": "ana", "n": 3, "ts": datetime.datetime(2024, 1, 2, 3, 4, 5)},
        {"user": "bob", "n": 1, "ts": datetime.datetime(2024, 1, 2, 3, 5, 0)},
    ]
    got = opensearch_bulk_payload(rows, "tweets")
    want = (
        b'{"index":{"_index":"tweets"}}\n'
        b'{"user":"ana","n":3,"ts":"2024-01-02T03:04:05"}\n'
        b'{"index":{"_index":"tweets"}}\n'
        b'{"user":"bob","n":1,"ts":"2024-01-02T03:05:00"}\n'
    )
    assert got == want


def test_bulk_payload_structure_rules():
    rows = [{"a": i} for i in range(5)]
    body = opensearch_bulk_payload(rows, "idx", id_field="a")
    # Trailing newline is mandatory: the API rejects a body without it.
    assert body.endswith(b"\n")
    lines = body.decode().splitlines()
    assert len(lines) == 10  # action + source per doc
    for i in range(0, 10, 2):
        action = json.loads(lines[i])
        source = json.loads(lines[i + 1])
        assert action == {"index": {"_index": "idx", "_id": str(i // 2)}}
        assert source == {"a": i // 2}
    assert opensearch_bulk_payload([], "idx") == b""


def test_bulk_payload_value_conversions():
    rows = [{
        "d": datetime.date(2024, 6, 1),
        "b": b"\x00\xff",
        "nan": float("nan"),
        "inf": float("inf"),
        "dec": __import__("decimal").Decimal("12.340"),
        "arr": [1, 2],
        "nested": {"x": datetime.date(2024, 6, 2)},
    }]
    src = json.loads(opensearch_bulk_payload(rows, "i").decode().splitlines()[1])
    assert src == {
        "d": "2024-06-01",
        "b": "AP8=",          # base64 of 0x00 0xff
        "nan": None,          # JSON has no NaN literal
        "inf": None,
        "dec": "12.340",      # no silent precision loss
        "arr": [1, 2],
        "nested": {"x": "2024-06-02"},
    }


def test_buffered_sink_sends_conformant_chunks(spark):
    """End-to-end through the sink: 5 rows, chunk_size=2 → three _bulk
    posts of 2/2/1 documents, each ndjson-typed and newline-terminated."""
    posts: list[tuple[str, bytes, dict]] = []
    sink = BufferedExternalSink(
        send=make_opensearch_bulk_send(
            lambda path, body, headers: posts.append((path, body, headers)),
            "events", id_field="event_id"),
        chunk_size=2,
    )
    df = spark.createDataFrame(
        [(i, f"u{i}", datetime.datetime(2024, 1, 1, 0, 0, i))
         for i in range(5)],
        "event_id long, user string, ts timestamp",
    ).orderBy("event_id")
    sink(df, batch_id=0)
    assert [p[0] for p in posts] == ["/_bulk"] * 3
    assert all(p[2] == {"Content-Type": "application/x-ndjson"} for p in posts)
    doc_counts = [len(p[1].decode().splitlines()) // 2 for p in posts]
    assert doc_counts == [2, 2, 1]
    # Every action line routes by _id; every source round-trips as JSON
    # with the isoformat timestamp.
    seen_ids = []
    for _, body, _ in posts:
        assert body.endswith(b"\n")
        lines = body.decode().splitlines()
        for i in range(0, len(lines), 2):
            action, source = json.loads(lines[i]), json.loads(lines[i + 1])
            assert action["index"]["_index"] == "events"
            seen_ids.append(action["index"]["_id"])
            assert source["ts"].startswith("2024-01-01T00:00:0")
    assert sorted(seen_ids) == [str(i) for i in range(5)]


def test_id_routing_makes_redelivery_idempotent(spark):
    """foreachBatch sinks re-deliver whole micro-batches on recovery;
    with _id routing the second delivery produces byte-identical _bulk
    payloads, so the index converges instead of duplicating (the
    reason make_opensearch_bulk_send takes id_field at all)."""
    posts: list[bytes] = []
    sink = BufferedExternalSink(
        send=make_opensearch_bulk_send(
            lambda path, body, headers: posts.append(body), "t",
            id_field="k"),
        chunk_size=10,
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string") \
        .orderBy("k")
    sink(df, batch_id=0)
    sink(df, batch_id=0)  # recovery re-delivery
    assert len(posts) == 2 and posts[0] == posts[1]
    assert b'"_id":"1"' in posts[0] and b'"_id":"2"' in posts[0]
