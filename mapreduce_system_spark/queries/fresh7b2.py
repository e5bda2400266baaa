"""Round-7 additions, unchanged-since-r7 pair (split out of ``fresh7b``).

``fresh7b`` holds the three r7 queries whose code CHANGED in round 8
(BM25 broadcast direction, surprisal vocab join, int8 dimension count) —
those re-pin inside the driver window. These two are r07-green and
byte-identical since; they moved here so their module no longer spends
window slots, freeing two positions for round-8 debuts
(``queries/__init__`` docstring has the full window ledger):

- ``fn_date_gap_fill_daily`` — time-series resampling: a calendar spine
  (``sequence`` + ``explode``) left-joined to daily per-type counts so
  missing days surface as explicit zeros. Scale shape: the events table
  aggregates FIRST (one shuffle on (type, day)); the spine is
  days x types — broadcast-sized at any corpus scale since it grows
  with the calendar, not the data.
- ``pipe_hash_split`` — deterministic train/val/test assignment by
  md5(doc_id) bucket (the standard reproducible-split trick: stable
  under re-runs, insertion-order-free, no RNG state to ship). Map-only
  plus a tiny (split, lang) rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# fn_date_gap_fill_daily — calendar-spine resampling with explicit zeros
# ---------------------------------------------------------------------------

_GAP_FILL_SQL = """
WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
d AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
t AS (SELECT DISTINCT event_type FROM events),
a AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1, 2)
SELECT t.event_type,
       strftime(d.day, '%Y-%m-%d') AS day,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
FROM d CROSS JOIN t
LEFT JOIN a ON a.event_type = t.event_type AND a.day = d.day
ORDER BY 1, 2
"""


@register("fn_date_gap_fill_daily", _GAP_FILL_SQL)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts per type with calendar gaps filled as zeros.

    The aggregation runs first (the only full-data shuffle); the spine
    (days x types) is calendar-sized, so Spark broadcasts the join no
    matter how large `events` is. The reference cannot express this at
    all — its model has no generator source (worker.go:92-104 reads
    only existing splits)."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type"])
    actual = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)  # calendar-sized x type-cardinality: tiny
    return (
        spine.join(actual, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# pipe_hash_split — deterministic md5-bucket train/val/test assignment
# ---------------------------------------------------------------------------

_HASH_SPLIT_SQL = f"""
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT lang, n_chars,
           {md5_bucket32_sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
    FROM documents
  )
)
GROUP BY split, lang
ORDER BY split, lang
"""


@register("pipe_hash_split", _HASH_SPLIT_SQL)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by md5(doc_id) bucket, reported as a
    (split, lang) rollup of doc counts and character mass.

    md5-bucketing is the reproducible-split idiom for training corpora:
    assignment is a pure function of the row key, so it is stable across
    re-runs, partitionings, and incremental ingests — no RNG seed to
    ship, no shuffle to assign. Map-only + a tiny rollup; at 100 TB the
    only cost is the scan. (The reference's model would need a custom
    mapf emitting the bucket as the key — README.MD:82.)"""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    bucket = md5_bucket32(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .orderBy("split", "lang")
    )
