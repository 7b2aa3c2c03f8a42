"""External search-index DDL (SURVEY §2 K6).

The reference hand-writes OpenSearch index mappings as literal dicts and
calls ``create_index`` before each streaming job starts
(``/root/reference/streaming/job1_bots.py:59-94`` — two mappings whose
field lists duplicate the DataFrame schema by hand, drifting the moment
either side changes).

Spark-first re-expression: the mapping is *derived from the DataFrame
schema* — one source of truth, no drift.  :func:`es_mapping_for_schema`
translates a ``StructType`` into an index-mapping body (keyword/text,
integer/long, double, boolean, ``date`` for timestamps, nested
``object`` for structs; arrays collapse to their element type because
search indexes treat every field as multi-valued).  :func:`ensure_index`
is the idempotent DDL step: it builds the body and hands it to a
pluggable ``transport`` callable.

No search cluster exists in this environment, so the default transport
is :class:`RecordingTransport` — it records the DDL calls so tests can
pin payloads and idempotence.  Wiring a real cluster is ONE callable
(``lambda name, body: requests.put(f"{host}/{name}", json=body)``);
everything schema-shaped is real and tested here.

Scale note: index DDL is a driver-side, once-per-job metadata call —
nothing about it shuffles or scales with data volume.  The bulk
*writes* go through ``streaming/runner.py``'s foreachBatch external
sink (K3), which chunks batches executor-side.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import types as T

#: Default string-field type.  Fields listed in ``text_fields`` index as
#: full-text ``text``; everything else is exact-match ``keyword`` (the
#: reference makes the same split: user_name keyword, text text).
_ATOMIC: dict[type, str] = {
    T.StringType: "keyword",
    T.CharType: "keyword",
    T.VarcharType: "keyword",
    T.BooleanType: "boolean",
    T.ByteType: "byte",
    T.ShortType: "short",
    T.IntegerType: "integer",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.DateType: "date",
    T.TimestampType: "date",
    T.TimestampNTZType: "date",
    T.BinaryType: "binary",
}


def _field_mapping(dt: T.DataType, name: str, text_fields: frozenset[str]) -> dict:
    if isinstance(dt, T.ArrayType):
        # Search indexes treat every field as implicitly multi-valued;
        # an array maps to its element's mapping.
        return _field_mapping(dt.elementType, name, text_fields)
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {
                f.name: _field_mapping(f.dataType, f.name, text_fields)
                for f in dt.fields
            },
        }
    if isinstance(dt, T.MapType):
        # Open-keyed maps become dynamic objects — the index learns
        # keys on first write, matching Spark's MapType semantics.
        return {"type": "object", "dynamic": True}
    if isinstance(dt, T.DecimalType):
        # Exact decimals index as scaled integers to keep range
        # filters exact (cents discipline carries into the index).
        return {"type": "scaled_float", "scaling_factor": 10**dt.scale}
    if isinstance(dt, (T.StringType, T.CharType, T.VarcharType)):
        return {"type": "text" if name in text_fields else "keyword"}
    for klass, es in _ATOMIC.items():
        if isinstance(dt, klass):
            return {"type": es}
    raise TypeError(f"no index mapping for Spark type {dt.simpleString()!r}")


def es_mapping_for_schema(
    schema: T.StructType, text_fields: tuple[str, ...] = ()
) -> dict:
    """Index-mapping body derived from a Spark schema (one source of
    truth — the hand-written dicts of the reference, generated)."""
    tf = frozenset(text_fields)
    return {
        "mappings": {
            "properties": {
                f.name: _field_mapping(f.dataType, f.name, tf)
                for f in schema.fields
            }
        }
    }


def _json_safe(v):
    """JSON-encodable form of a collected Spark value, matching what an
    OpenSearch document accepts: datetimes/dates → isoformat (the
    reference does the same per-row, ``streaming/elk_sender.py:120-123``),
    Decimal → str (no silent precision loss), binary → base64 (the OS
    ``binary`` field type), Row/struct → dict, NaN/Inf → null (JSON has
    no literal for them; ``json.dumps(allow_nan=False)`` would raise)."""
    import base64
    import decimal
    import math as _math

    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, float):
        return v if _math.isfinite(v) else None
    if isinstance(v, decimal.Decimal):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if hasattr(v, "asDict"):
        return {k: _json_safe(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return str(v)


def opensearch_bulk_payload(
    rows: "list[dict]", index_name: str, id_field: str | None = None
) -> bytes:
    """The exact body an OpenSearch/Elasticsearch ``_bulk`` endpoint
    expects (replaces the reference's per-document HTTP posts,
    ``streaming/elk_sender.py:85-128``): one compact-JSON ACTION line
    then one SOURCE line per document, newline-separated, INCLUDING the
    trailing newline — the API rejects a body whose last line is not
    newline-terminated.  ``id_field`` routes idempotent upserts via
    ``_id`` (exactly-once sinks re-deliver on retry; without an id the
    server assigns one and re-delivery duplicates).  Ship with
    ``Content-Type: application/x-ndjson``."""
    import json

    lines: list[str] = []
    for row in rows:
        doc = {k: _json_safe(v) for k, v in row.items()}
        action: dict = {"index": {"_index": index_name}}
        if id_field is not None:
            action["index"]["_id"] = str(doc[id_field])
        lines.append(json.dumps(action, separators=(",", ":")))
        lines.append(json.dumps(doc, separators=(",", ":")))
    return ("\n".join(lines) + "\n").encode("utf-8") if lines else b""


def make_opensearch_bulk_send(
    post: "Callable[[str, bytes, dict], Any]",
    index_name: str,
    id_field: str | None = None,
) -> "Callable[[list[dict]], None]":
    """Adapter giving :class:`~..streaming.runner.BufferedExternalSink`
    a real bulk-protocol ``send``: each chunk becomes ONE ``_bulk``
    request through the injectable ``post(path, body, headers)``
    boundary (tests inject a recorder; production injects an HTTP
    client — no cluster exists in this sandbox, so the payload contract
    is what the tests pin)."""

    def send(rows: "list[dict]") -> None:
        if not rows:
            return
        post(
            "/_bulk",
            opensearch_bulk_payload(rows, index_name, id_field),
            {"Content-Type": "application/x-ndjson"},
        )

    return send


class RecordingTransport:
    """Default transport: records DDL calls instead of sending them.

    ``calls`` is the audit log; ``existing`` simulates server-side
    index state so :func:`ensure_index` idempotence is testable.
    """

    def __init__(self) -> None:
        self.calls: list[tuple[str, dict]] = []
        self.existing: set[str] = set()

    def __call__(self, index_name: str, body: dict) -> bool:
        """Create ``index_name`` if absent; True when created."""
        if index_name in self.existing:
            return False
        self.calls.append((index_name, body))
        self.existing.add(index_name)
        return True


def ensure_index(
    index_name: str,
    schema: T.StructType,
    text_fields: tuple[str, ...] = (),
    transport: Callable[[str, dict], Any] | None = None,
    extra_settings: dict | None = None,
) -> dict:
    """Idempotent index DDL: build the mapping from ``schema`` and hand
    it to ``transport`` (defaults to a fresh :class:`RecordingTransport`
    — a dry run).  Returns the body sent, for logging/assertion."""
    body = es_mapping_for_schema(schema, text_fields)
    if extra_settings:
        body["settings"] = dict(extra_settings)
    (transport or RecordingTransport())(index_name, body)
    return body
