"""Batch twins of the streaming window operators, DuckDB-oracled.

DuckDB can't execute a stream, so the correctness strategy (SURVEY.md §5)
is streaming-batch parity: these queries run the *same functions* from
``streaming.windows`` on the batch events table and carry exact SQL
oracles; tests/test_streaming.py then drives the identical functions
through a real file-source stream and asserts the results match batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table
from mapreduce_system_spark.streaming import windows as SW

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


_TUMBLING_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '{_TS_FMT_DUCK}') AS w_start,
       event_type,
       count(*) AS cnt
FROM events
GROUP BY w_start, event_type
ORDER BY w_start, event_type
"""


@register("stream_tumbling_event_counts", _TUMBLING_SQL)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling counts per event type (batch twin)."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type"])
    out = SW.tumbling_counts(ev, duration="15 minutes", group_cols=["event_type"])
    return out.select(
        F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("w_start"),
        "event_type",
        "cnt",
    ).orderBy("w_start", "event_type")


_SLIDING_SQL = f"""
WITH e AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS b0, value FROM events
), x AS (
  SELECT unnest([b0, b0 - INTERVAL '15 minutes']) AS ws, value FROM e
)
SELECT strftime(ws, '{_TS_FMT_DUCK}') AS w_start,
       count(*) AS cnt,
       round(avg(value), 6) AS avg_value
FROM x
GROUP BY w_start
ORDER BY w_start
"""


@register("stream_sliding_avg_value", _SLIDING_SQL)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding by 15 — every event lands in two windows
    (the oracle unnests the two containing window starts)."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "value"])
    out = SW.sliding_avg(ev, duration="30 minutes", slide="15 minutes")
    return out.select(
        F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("w_start"),
        "cnt",
        F.round("avg_value", 6).alias("avg_value"),
    ).orderBy("w_start")


# Session semantics: a new session starts when the gap to the previous
# event EXCEEDS 5 minutes (Spark merges an exactly-gap-sized interval —
# verified in tests/test_streaming.py::test_session_window_gap_semantics).
_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS cnt
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register("stream_session_counts_user", _SESSION_SQL)
def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (5-minute inactivity gap) — the oracle is
    the gaps-and-islands SQL equivalent."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id"])
    out = SW.session_counts(ev, key_col="user_id", gap="5 minutes")
    return out.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        "cnt",
    ).orderBy("user_id", "session_start")


_STREAM_DEDUP_SQL = """
SELECT event_type, count(*) AS n_unique_users
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
ORDER BY event_type
"""


@register("stream_dedup_exact", _STREAM_DEDUP_SQL)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ingestion-time dedup (streaming.windows.dedup_keys):
    first event per (user_id, event_type) survives; the stream form with
    ``dropDuplicatesWithinWatermark`` is asserted equal in
    tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "event_type"])
    deduped = SW.dedup_keys(ev, ["user_id", "event_type"])
    return (
        deduped.groupBy("event_type")
        .agg(F.count("*").alias("n_unique_users"))
        .orderBy("event_type")
    )


# Interval (stream-stream) join twin: purchases within 30 minutes of a
# click by the same user — click→purchase attribution. The oracle is the
# identical time-bounded self-join in SQL.
_INTERVAL_JOIN_SQL = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT c.user_id, c.ts AS c_ts, p.ts AS p_ts, p.value
       FROM c JOIN p ON c.user_id = p.user_id
                    AND p.ts >= c.ts
                    AND p.ts <= c.ts + INTERVAL '30 minutes'
     )
SELECT user_id,
       count(*) AS n_attributed,
       CAST(min(date_diff('second', c_ts, p_ts)) AS BIGINT) AS min_lag_s,
       round(sum(value), 2) AS attributed_value
FROM j
GROUP BY user_id
ORDER BY user_id
"""


@register("stream_interval_join_attrib", _INTERVAL_JOIN_SQL)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming.windows.interval_join): purchases attributed to a same-user
    click within 30 minutes, profiled per user. The streaming form — both
    sides watermarked, same time-range predicate bounding join state — is
    asserted equal in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id", "event_type", "value"])
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = SW.interval_join(clicks, purchases, on="user_id", max_delay="30 minutes")
    return (
        joined.groupBy(F.col("l_user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_attributed"),
            # cast via timestamp_ltz: the fixture's ts column is
            # TIMESTAMP_NTZ or _LTZ depending on how the parquet was
            # written (isAdjustedToUTC); NTZ→BIGINT is not castable
            # directly, NTZ→LTZ→BIGINT is, and the difference of two
            # epochs is timezone-invariant either way.
            F.min(
                F.col("r_ts").cast("timestamp_ltz").cast("long")
                - F.col("l_ts").cast("timestamp_ltz").cast("long")
            ).alias("min_lag_s"),
            F.round(F.sum("r_value"), 2).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("stream_user_totals_batch", _TOTALS_SQL)
def q_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful running-totals operator
    (streaming.stateful.user_running_totals) — the stream's final state
    must equal this result (asserted in tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "value"])
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("user_id")
    )


_DISTINCT_USERS_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '60 minutes', ts), '{_TS_FMT_DUCK}') AS w_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id IS NOT NULL
GROUP BY w_start
ORDER BY w_start
"""


@register("stream_tumbling_distinct_users", _DISTINCT_USERS_SQL)
def q_tumbling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly distinct users (batch twin of the streaming-safe two-phase
    dedup+count — COUNT(DISTINCT) itself cannot run incrementally).
    Registered r4 — first driver row lands when the window rotates;
    verified locally meanwhile, streaming parity in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id"])
    out = SW.tumbling_distinct_users(ev, duration="60 minutes")
    return out.select(
        F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("w_start"),
        F.col("n_users"),
    ).orderBy("w_start")


_STATIC_ENRICH_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts), '{_TS_FMT_DUCK}') AS w_start,
       c_mktsegment,
       count(*) AS cnt,
       round(sum(value), 4) AS total_value
FROM events JOIN customer ON c_custkey = user_id
GROUP BY w_start, c_mktsegment
ORDER BY w_start, c_mktsegment
"""


@register("stream_static_enrich", _STATIC_ENRICH_SQL)
def q_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (batch twin): events joined to the
    broadcast customer dimension, 30-minute windowed count + value sum
    per market segment. The streaming pytest drives the same
    ``streaming.windows.static_enrich`` through a file stream — the
    stream-static join is stateless, so parity is exact."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id", "value"])
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = SW.static_enrich(ev, cust)
    return out.select(
        F.date_format(F.col("w.start"), _TS_FMT_SPARK).alias("w_start"),
        "c_mktsegment",
        "cnt",
        F.round("total_value", 4).alias("total_value"),
    ).orderBy("w_start", "c_mktsegment")
