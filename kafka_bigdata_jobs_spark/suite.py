"""The oracle-checked query suite.

Each entry pairs a PySpark implementation (built from the operator
library) with an ANSI-SQL oracle that DuckDB runs over the same parquet
tables.  Registration contract (driver's ``__spark_entry__.py``):

- callable signature ``(spark, sf_dir) -> DataFrame``
- every computed column aliased identically in Spark and SQL
- deterministic outputs only (FIXTURES.md §4): exact distinct counts,
  ``round(…, 2)`` on floating aggregates so the order-insensitive value
  hash is FP-stable, explicit tie-breakers on every top-k.

Queries whose semantics SQL can't express (streaming, iterative) have
``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import relational as R
from .operators import temporal as TP
from .operators import text as TX
from .schemas import load_table
from .session import apply_runtime_conf


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        q = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        _REGISTRY[name] = q
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_conf(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.5/2.7) on lineitem/orders/customer/events
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0           AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0      AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) / 10000.0
                                                                        AS sum_disc_price,
           ROUND(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                                                        AS avg_qty,
           ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                                                        AS avg_price,
           ROUND(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) / (COUNT(*) * 100.0), 4)
                                                                        AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: grouped multi-aggregate scan (TPC-H Q1 shape; the "
    "reference's analyze_daily_volume/top_locations idiom, "
    "batch/job2_historico.py:99-104).",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price_bp = R.cents("l_extendedprice") * (100 - R.cents("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        R.exact_sum("l_quantity").alias("sum_qty"),
        R.exact_sum("l_extendedprice").alias("sum_base_price"),
        (F.sum(disc_price_bp) / 10000.0).alias("sum_disc_price"),
        R.exact_avg("l_quantity", 2).alias("avg_qty"),
        R.exact_avg("l_extendedprice", 2).alias("avg_price"),
        R.exact_avg("l_discount", 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "daily_volume",
    """
    SELECT CAST(ts AS DATE)                                   AS event_date,
           COUNT(*)                                           AS n_events,
           COUNT(DISTINCT user_id)                            AS uniq_users,
           ROUND(SUM(CAST(ROUND(value*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                                              AS avg_value,
           COUNT(*) FILTER (WHERE event_type = 'purchase')    AS n_purchases
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="Daily volume: count + exact distinct + count-if per day "
    "(reference batch/job2_historico.py:96-118 analyze_daily_volume).",
)
def q_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("uniq_users"),
        R.exact_avg("value", 2).alias("avg_value"),
        R.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )


@register(
    "segment_summary",
    """
    SELECT c_mktsegment,
           COUNT(*)                                        AS n_customers,
           COUNT(DISTINCT c_nationkey)                     AS n_nations,
           COUNT(*) FILTER (WHERE c_acctbal > 0)           AS n_positive,
           ROUND(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                                           AS avg_acctbal,
           ROUND(COUNT(*) FILTER (WHERE c_acctbal > 0) * 100.0 / COUNT(*), 2)
                                                           AS pct_positive
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY n_customers DESC, c_mktsegment
    LIMIT 10
    """,
    doc="Top-locations shape: group + distinct + count-if + pct + ordered "
    "top-k with tie-break (reference batch/job1_locations.py:96-124).",
)
def q_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        R.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
        R.exact_avg("c_acctbal", 2).alias("avg_acctbal"),
    )
    agg = agg.withColumn(
        "pct_positive", R.pct(F.col("n_positive"), F.col("n_customers"))
    )
    return R.top_k(
        agg, [F.desc("n_customers")], 10, tie_breakers=[F.col("c_mktsegment")]
    )


@register(
    "top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k with deterministic tie-break; Spark plans "
    "TakeOrderedAndProject (reference orderBy(desc).limit idiom, "
    "batch/job5_menciones.py:90-91).",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    return R.top_k(o, [F.desc("o_totalprice")], 10, tie_breakers=[F.col("o_orderkey")])


@register(
    "priority_pivot",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot crosstab with explicit values + fillna(0) (reference "
    "batch/job1_locations.py:111-124; explicit values avoid the "
    "distinct-scan pre-job, SURVEY §4).",
)
def q_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return R.pivot_counts(o, ["o_orderpriority"], "o_orderstatus", ["F", "O", "P"])


@register(
    "value_band_ladder",
    """
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 50 THEN 'mid'
                WHEN value < 200 THEN 'high'
                ELSE 'whale' END                      AS value_band,
           COUNT(*)                                   AS n_events,
           SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="Chained multi-way CASE categorization (reference device CASE, "
    "batch/job2_historico.py:147-158; alert priority ladder, "
    "streaming/job5.py:177-180).",
)
def q_value_band_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 50, "mid")
        .when(F.col("value") < 200, "high")
        .otherwise("whale")
    )
    return (
        ev.withColumn("value_band", band)
        .groupBy("value_band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            R.exact_sum("value").alias("total_value"),
        )
    )


@register(
    "temporal_pattern",
    """
    SELECT hour(ts)                                          AS hour,
           dayname(ts)                                       AS day_name,
           dayname(ts) IN ('Saturday', 'Sunday')             AS is_weekend,
           COUNT(*)                                          AS n_events,
           ROUND(SUM(CAST(ROUND(value*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                                             AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Temporal features: hour, day-name, weekend flag (reference "
    "batch/job3_patron_temporal.py:57-74,156-182).",
)
def q_temporal_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = TP.with_temporal_features(_t(spark, sf_dir, "events"), "ts")
    return ev.groupBy(
        F.col("hour"), F.col("day_name"), F.col("is_weekend")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        R.exact_avg("value", 2).alias("avg_value"),
    )


@register(
    "union_tagged_entities",
    """
    SELECT entity_type,
           COUNT(*)                        AS n_entities,
           COUNT(DISTINCT nationkey)      AS n_nations,
           ROUND(SUM(CAST(ROUND(acctbal*100) AS BIGINT)) / (COUNT(*) * 100.0), 2)
                                          AS avg_acctbal
    FROM (
      SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS entity_type FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS entity_type FROM supplier
    )
    GROUP BY entity_type
    """,
    doc="Tagged union + groupBy on discriminator — the reference's "
    "bitcoin∪ethereum crypto_type pattern (batch/job1_locations.py:38,53,65).",
)
def q_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    u = R.tagged_union(
        [(c, "customer"), (s, "supplier")], "entity_type", ["nationkey", "acctbal"]
    )
    return u.groupBy("entity_type").agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.countDistinct("nationkey").alias("n_nations"),
        R.exact_avg("acctbal", 2).alias("avg_acctbal"),
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           COUNT(*)                                                       AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))        AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON decode at the boundary: from_json + struct access "
    "(reference streaming/job1_bots.py:136-138 from_json; SURVEY §2.9).",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("props_s", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(F.col("props_s.k")), 2).alias("avg_k"),
        F.max(F.col("props_s.k")).alias("max_k"),
    )


@register(
    "top_words",
    """
    SELECT word, COUNT(*) AS n_occurrences
    FROM (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
      WHERE text IS NOT NULL
    )
    WHERE length(word) >= 1
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 20
    """,
    doc="Tokenize + explode + count + ordered top-k (reference hashtag "
    "trending, streaming/job2.py:144-199, re-expressed over documents).",
)
def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = TX.extract_words(d, "text", out_col="word")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return R.top_k(counts, [F.desc("n_occurrences")], 20, tie_breakers=[F.col("word")])
