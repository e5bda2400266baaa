"""Round-7 additions (second batch): changelog/warehouse maintenance ops.

Two shapes every large-scale ingest pipeline needs that the catalog
lacked — both over the ``events`` table as a change stream keyed by
``user_id``, both with exact DuckDB oracles:

- ``rel_cdc_latest_state`` — CDC compaction: collapse a changelog to
  the latest record per key ("upsert view"). Deliberately NOT the
  row_number()-over-window formulation: ``max(struct(ts, event_id,
  ...))`` is an ordinary aggregate, so Catalyst runs it partial+final
  (map-side combine) — at 100 TB each mapper reduces its split to one
  row per local key before the shuffle, where the window variant must
  shuffle-and-sort EVERY changelog row. The struct's leading fields
  (ts, event_id) give a total order, so ties are impossible.
- ``rel_scd2_intervals`` — slowly-changing-dimension (type 2)
  historization: detect attribute changes per key (lag), then build
  validity intervals [valid_from, valid_to) with lead; the open
  interval is flagged current. Both window passes share one
  shuffle+sort on (user_id | ts, event_id) — Catalyst reuses the
  exchange since partitioning and ordering are identical.

Timestamps ride as epoch microseconds (``unix_micros`` /
``epoch_us``) — exact BIGINTs on both engines, no float or format
ambiguity (registry.py conventions).

The reference cannot express either without a full re-sort of the
corpus per query — its reduce sees values in arrival order with no
secondary sort (worker.go:153-165 sorts by key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_CDC_SQL = """
SELECT user_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
       event_type AS last_type,
       round(value, 2) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@register("rel_cdc_latest_state", _CDC_SQL)
def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per user from the events changelog (CDC compaction).

    Spark side uses max(struct(ts, event_id, payload...)) — an
    aggregate with map-side partial combine, the scale shape; the
    oracle uses the equivalent row_number()=1 formulation (identical
    by the struct's lexicographic order on the unique (ts, event_id))."""
    ev = load_table(
        spark, sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    latest = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s")
    )
    return latest.select(
        "user_id",
        F.unix_micros("s.ts").alias("last_ts_us"),
        F.col("s.event_type").alias("last_type"),
        F.round("s.value", 2).alias("last_value"),
    ).orderBy("user_id")


_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
iv AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
         CAST(coalesce(
           epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)), -1
         ) AS BIGINT) AS valid_to_us
  FROM changes
)
SELECT user_id, event_type, valid_from_us, valid_to_us,
       valid_to_us = -1 AS is_current
FROM iv
ORDER BY user_id, valid_from_us
"""


@register("rel_scd2_intervals", _SCD2_SQL)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 historization of each user's event_type attribute:
    one row per change, with [valid_from, valid_to) epoch-µs validity
    and an is_current flag (open interval encoded as -1).

    lag (change detection) and lead (interval close) use the same
    (partitionBy user_id, orderBy ts/event_id) spec, so the plan
    contains ONE exchange and one sort feeding both windows."""
    ev = load_table(
        spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    iv = changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.coalesce(F.unix_micros(F.lead("ts").over(w)), F.lit(-1)).alias("valid_to_us"),
    )
    return iv.select(
        "user_id",
        "event_type",
        "valid_from_us",
        "valid_to_us",
        (F.col("valid_to_us") == -1).alias("is_current"),
    ).orderBy("user_id", "valid_from_us")
