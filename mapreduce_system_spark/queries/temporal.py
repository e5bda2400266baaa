"""Temporal, JSON, and as-of/range-join queries.

Covers the date/json scalar-function surface (SURVEY.md §2b: the
``events.props`` JSON column and the two timestamp columns) and the
as-of/range joins (§7 P4). The as-of oracle uses DuckDB's native ASOF
JOIN — semantics (latest right with right_time <= left_time) match the
union+window formulation in ``operators.asof`` exactly once the right
side is unique per (key, time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_system_spark.operators import asof as ASOF
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_JSON_SQL = """
WITH x AS (
  SELECT event_type,
         CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract(props, '$.k') AS INT) END AS k
  FROM events
)
SELECT event_type,
       count(*) AS cnt,
       CAST(min(k) AS INT) AS min_k,
       CAST(max(k) AS INT) AS max_k,
       round(avg(k), 4) AS avg_k
FROM x
GROUP BY event_type
ORDER BY event_type
"""


@register("fn_json_props", _JSON_SQL)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON payload (from_json → typed struct) and
    aggregate the extracted field — JSON parsing stays JVM-side.

    The oracle mirrors from_json's STRICT typed semantics with a
    json_type gate: an int field is NULL unless the JSON value is an
    integer NUMBER — a string-encoded '"5"' or a 5.5 is NULL on both
    engines (a bare CAST(json_extract ...) in DuckDB would parse '"5"'
    to 5 and diverge — the latent quoted-number class found in the r9
    review)."""
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "props"])
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return (
        ev.select("event_type", F.from_json("props", schema).getField("k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


_MONTHLY_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY month
ORDER BY month
"""


@register("fn_date_trunc_monthly", _MONTHLY_SQL)
def q_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup via date_trunc — the partition-pruning shape
    (at scale, month would be the physical partition key)."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("month")
    )


_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       event_type,
       count(*) AS cnt,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type
"""


@register("fn_date_trunc_hourly_events", _HOURLY_SQL)
def q_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup — exercises the nanosecond-parquet → microsecond
    timestamp path end to end (sources.tables nanosAsLong handling)."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type", "value"])
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("hour", "event_type")
    )


_ASOF_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), r1 AS (SELECT * FROM r WHERE rn = 1)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey,
       round(o.o_totalprice, 2) AS last_price
FROM events e
ASOF LEFT JOIN r1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


@register("asof_join_events_orders", _ASOF_SQL)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order at
    event time (union + keyed window — one shuffle, per-key sort)."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    right = ASOF.latest_per_key_time(orders, "o_custkey", "o_orderdate", "o_orderkey").withColumnRenamed(
        "o_custkey", "user_id"
    )
    out = ASOF.asof_join(
        ev,
        right,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_price"),
    ).orderBy("event_id")


_BANDS = [("budget", 0.0, 20000.0), ("mid", 20000.0, 60000.0), ("premium", 60000.0, 1e12)]

_RANGE_SQL = """
SELECT band, count(*) AS cnt, round(sum(l_extendedprice), 2) AS total
FROM lineitem
JOIN (VALUES ('budget', 0.0, 20000.0),
             ('mid', 20000.0, 60000.0),
             ('premium', 60000.0, 1e12)) AS bands(band, lo, hi)
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
ORDER BY band
"""


@register("rel_range_join_price_bands", _RANGE_SQL)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: prices into [lo, hi) intervals via broadcast
    nested loop — the correct plan for a 3-row band table."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_extendedprice"])
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        ASOF.range_join(li, bands, "l_extendedprice")
        .groupBy("band")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("band")
    )
