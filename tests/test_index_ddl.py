"""K6 external index DDL: mapping derivation from real query schemas.

The reference hand-writes two OpenSearch mappings and create_index()s
them at job start (streaming/job1_bots.py:59-94).  Here the mapping is
derived from the DataFrame schema; these tests pin the type translation
against a real alert-shaped output, nested structs, arrays, decimals,
and the idempotence of ensure_index.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_bigdata_jobs_spark.index_ddl import (
    RecordingTransport,
    ensure_index,
    es_mapping_for_schema,
)


def test_alert_schema_translation(spark, sf_dir):
    # Shape of the reference's bot-alerts index, produced by a real query.
    from kafka_bigdata_jobs_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    alerts = ev.select(
        F.col("event_type").alias("alert_type"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("value").alias("metric_value"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit(True).alias("verified"),
        F.concat_ws(" ", F.lit("alert for"), F.col("event_type")).alias("reason"),
    )
    m = es_mapping_for_schema(alerts.schema, text_fields=("reason",))
    props = m["mappings"]["properties"]
    assert props["alert_type"] == {"type": "keyword"}
    assert props["user_id"] == {"type": "long"}
    assert props["metric_value"] == {"type": "double"}
    assert props["timestamp"] == {"type": "date"}
    assert props["verified"] == {"type": "boolean"}
    assert props["reason"] == {"type": "text"}


def test_nested_array_map_decimal():
    schema = T.StructType(
        [
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("followers", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField("props", T.MapType(T.StringType(), T.StringType())),
            T.StructField("price", T.DecimalType(12, 2)),
        ]
    )
    props = es_mapping_for_schema(schema)["mappings"]["properties"]
    assert props["tags"] == {"type": "keyword"}  # arrays collapse to element
    assert props["user"]["type"] == "object"
    assert props["user"]["properties"]["followers"] == {"type": "integer"}
    assert props["props"] == {"type": "object", "dynamic": True}
    assert props["price"] == {"type": "scaled_float", "scaling_factor": 100}


def test_ensure_index_idempotent():
    schema = T.StructType([T.StructField("k", T.StringType())])
    tr = RecordingTransport()
    body1 = ensure_index("alerts-v1", schema, transport=tr)
    body2 = ensure_index("alerts-v1", schema, transport=tr)
    assert body1 == body2
    assert len(tr.calls) == 1  # second call was a no-op server-side
    assert tr.calls[0][0] == "alerts-v1"
    assert "mappings" in tr.calls[0][1]


def test_extra_settings_passthrough():
    schema = T.StructType([T.StructField("k", T.StringType())])
    body = ensure_index(
        "metrics-v1", schema, extra_settings={"number_of_shards": 4}
    )
    assert body["settings"] == {"number_of_shards": 4}
