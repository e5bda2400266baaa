"""Round-5 additions: skew-safe as-of join, driver-checkable ANN recall,
range-frame window functions, batch sessionization.

Registered FIRST among the domain modules this round so each lands inside
the driver's 50-query correctness window on its debut:

- ``asof_join_salted_events``: the two-phase skew-resistant as-of variant
  (operators/asof.py::asof_join_salted) run end-to-end on the same
  events×orders workload — and the same DuckDB native ASOF oracle — as
  ``asof_join_events_orders``, proving the salted rewrite is semantically
  invisible on the driver's record (parity was previously pytest-only).
- ``sim_recall_at_k``: recall@5 of the IVF index vs exact brute force,
  per query. The probe table is exported; DuckDB independently re-derives
  BOTH the exact and the approximate top-5 and recomputes every recall
  value, making the approximation *quality* itself hash-checked rather
  than pytest-only.
- ``rel_window_range_frames``: RANGE-frame windows (value-based frame
  bounds over epoch seconds) + ntile/percent_rank — the window-function
  surface beyond the ROWS frames already covered.
- ``rel_sessionize_events``: gaps-and-islands sessionization (lag +
  conditional cumulative sum), the batch twin of the streaming
  ``session_window`` queries, rolled up to a per-user session profile.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators import asof as ASOF
from mapreduce_system_spark.operators import similarity as SIM
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# asof_join_salted_events
# ---------------------------------------------------------------------------

# Same oracle text as queries/temporal.py::_ASOF_SQL (kept literal here —
# importing temporal at module scope would register its queries early and
# shift the correctness window). The salted operator must be
# observationally identical to the plain one, so sharing the oracle IS the
# point: DuckDB's native ASOF JOIN checks both.
_ASOF_SALTED_SQL = """
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


@register("asof_join_salted_events", _ASOF_SALTED_SQL)
def q_asof_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant as-of join (operators/asof.py::asof_join_salted):
    left events spread over 8 salts by event_id hash, right orders
    replicated per salt, so one hot user key can't pin a whole task at
    100× scale. Identical semantics to ``asof_join_events_orders`` —
    verified against the identical DuckDB native-ASOF oracle."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )
    right = ASOF.latest_per_key_time(
        orders, "o_custkey", "o_orderdate", "o_orderkey"
    ).withColumnRenamed("o_custkey", "user_id")
    out = ASOF.asof_join_salted(
        ev,
        right,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        salt_src_col="event_id",
        n_salts=8,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_price"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# sim_recall_at_k
# ---------------------------------------------------------------------------

_N_QUERIES = 10
_TOPK = 5


def _recall_probe_path(sf_name: str) -> str:
    return f"/tmp/spark_graft_recall_probes_{sf_name}"


# DuckDB re-derives the exact top-5 (brute force over embeddings) AND the
# IVF top-5 (candidates = embeddings in the exported probe partitions),
# then recomputes recall per query — the approximation quality is checked
# end to end, not just the candidate plumbing.
_RECALL_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}
), ex AS (
  SELECT query_id, vec_id, c FROM (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS c,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC,
                      e.vec_id) AS rn
    FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
  ) WHERE rn <= {_TOPK}
), t5 AS (
  SELECT query_id, min(c) AS thresh FROM ex GROUP BY query_id
), pr AS (
  SELECT query_id, label FROM read_parquet('{_recall_probe_path("sf0.01")}/*.parquet')
), ap AS (
  SELECT query_id, vec_id, c FROM (
    SELECT pr.query_id, e.vec_id,
           list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS c,
           row_number() OVER (
             PARTITION BY pr.query_id
             ORDER BY round(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC,
                      e.vec_id) AS rn
    FROM pr JOIN q USING (query_id) JOIN embeddings e ON e.label = pr.label
    WHERE e.vec_id <> pr.query_id
  ) WHERE rn <= {_TOPK}
), h AS (
  SELECT ap.query_id, count(*) AS n_hits
  FROM ap JOIN t5 USING (query_id)
  WHERE ap.c >= t5.thresh - 1e-9
  GROUP BY ap.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {_TOPK}.0, 2) AS recall
FROM q LEFT JOIN h ON q.query_id = h.query_id
ORDER BY q.query_id
"""


@register("sim_recall_at_k", _RECALL_SQL, sf_bound=True)
def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index (nprobe=3 over the label partitions)
    against exact brute force, per query vector — the driver-checkable
    form of tests/test_similarity.py's recall floor. Both sides are
    re-derived independently: Spark computes them with its unit-vector
    JVM fold, DuckDB wholly from the embeddings table + the exported
    probe assignments via list_cosine_similarity.

    TIE-ROBUST hit definition: an approx candidate counts as a hit when
    its exact cosine clears the 5th-best exact cosine minus 1e-9 —
    recall-with-ties, the standard ANN-benchmark form. Set-intersection
    recall would flip on the rank-5/6 boundary whenever the two engines'
    float pipelines disagree by one ulp there (the advisor's round-5
    fragility note); the 1e-9 slack dwarfs cross-engine ulp noise while
    still failing any genuinely-missed neighbor."""
    from mapreduce_system_spark.caches import tracked_cache

    # the corpus is scanned by the probe export, the exact top-k, and the
    # IVF top-k — cache the 3-column projection once for the query
    emb = tracked_cache(
        load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    )
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = SIM.label_centroids(emb, partition_col="label")
    probes = SIM.ivf_probes(q, centroids, nprobe=3, partition_col="label")
    path = _recall_probe_path(Path(sf_dir).name)
    probes.write.mode("overwrite").parquet(path)
    probes_back = spark.read.parquet(path)

    thresh = (
        SIM.brute_force_topk(emb, q, k=_TOPK)
        .groupBy("query_id")
        .agg(F.min("cos").alias("thresh"))
    )
    approx = SIM.ivf_topk(emb, q, k=_TOPK, probes=probes_back).select("query_id", "cos")
    hits = (
        approx.join(F.broadcast(thresh), "query_id")
        .where(F.col("cos") >= F.col("thresh") - 1e-9)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / _TOPK, 2).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# rel_window_range_frames
# ---------------------------------------------------------------------------

# Epoch seconds as the RANGE order key on both sides: Spark unix_timestamp
# floors to whole seconds; DuckDB floor(epoch(ts)) matches. A 3600-second
# value-based frame is the "rolling last hour" every monitoring rollup
# wants — unlike a ROWS frame it is row-density independent.
_RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS rolling_1h,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id) AS INT) AS quartile,
       round(percent_rank() OVER (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id), 6) AS pr
FROM events
ORDER BY event_id
"""


@register("rel_window_range_frames", _RANGE_FRAME_SQL)
def q_window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user rolling-last-hour sum over a
    value-based (epoch-second) frame — peers at the same instant are one
    frame regardless of row count — plus ntile(4) quartiles and
    percent_rank over a deterministic (value, event_id) order. One shuffle
    on user_id serves all three window specs."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ev = ev.withColumn("epoch_s", F.unix_timestamp("ts"))
    w_range = (
        W.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-3600, 0)
    )
    # asc_nulls_last: Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST —
    # a NULL value row must rank last on both engines (fresh8e precedent)
    w_rank = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w_range), 6).alias("rolling_1h"),
            F.ntile(4).over(w_rank).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w_rank), 6).alias("pr"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# rel_sessionize_events
# ---------------------------------------------------------------------------

_GAP_S = 1800  # 30-minute inactivity gap, matching the streaming session queries

# Gaps-and-islands in portable SQL: a session starts when the gap from the
# previous event (same user, (ts, event_id) order) exceeds 30 minutes;
# cumulative sum of starts numbers the sessions; roll up per user.
_SESSIONIZE_SQL = f"""
WITH t AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY es, event_id) AS prev_es
  FROM events
), s AS (
  SELECT user_id, event_id, es,
         sum(CASE WHEN prev_es IS NULL OR es - prev_es > {_GAP_S} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM t
), g AS (
  SELECT user_id, sess_id, count(*) AS n_events, max(es) - min(es) AS dur_s
  FROM s GROUP BY user_id, sess_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       round(avg(dur_s), 2) AS avg_session_secs
FROM g GROUP BY user_id ORDER BY user_id
"""


@register("rel_sessionize_events", _SESSIONIZE_SQL)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): lag over (user, time) finds
    30-minute inactivity gaps, a conditional cumulative sum numbers the
    sessions, then a per-user profile. The batch twin of the streaming
    ``session_window`` queries — one shuffle on user_id covers both window
    passes (same partitioning, compatible ordering) plus the final rollup."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "event_id", "ts"])
    ev = ev.withColumn("es", F.unix_timestamp("ts"))
    # BOTH windows order by (es, event_id) — the lag and the cumulative
    # sum must see rows identically, or an event sharing a floor-second
    # with a session boundary could land in the wrong session depending
    # on tie order (the oracle mirrors the same keys).
    w_lag = W.partitionBy("user_id").orderBy("es", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    starts = F.when(
        F.col("prev_es").isNull() | (F.col("es") - F.col("prev_es") > _GAP_S), 1
    ).otherwise(0)
    sessions = (
        ev.withColumn("prev_es", F.lag("es").over(w_lag))
        .withColumn("sess_id", F.sum(starts).over(w_cum))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("es") - F.min("es")).alias("dur_s"),
        )
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_session_events"),
            F.round(F.avg("dur_s"), 2).alias("avg_session_secs"),
        )
        .orderBy("user_id")
    )
