"""Round-8 additions (thirteenth batch — registered past the 50-query
driver window behind fresh8l; rotates in r9).

Three operators:

- ``fn_ohlc_hourly`` — OHLC (open/high/low/close) bars per event type
  and hour: the time-series compaction every metrics store performs.
  Open/close come from ``min(struct)`` / ``max(struct)`` over the
  unique (ts, event_id) order — ordinary aggregates with map-side
  partial combine, NOT a window sort of the raw stream (the same
  argmax algebra as ``rel_cdc_latest_state``).
- ``pipe_keep_latest_k`` — retention policy: keep each key's latest K
  changelog records. One ranked window whose ``rn <= K`` predicate
  Spark's window-group-limit optimization pushes INTO the sort, so
  each partition keeps a K-row heap per key instead of sorting
  everything it drops.
- ``emb_pca_power_iteration`` — two matrix-free power-iteration
  rounds (v ← normalize(Xᵀ(Xv))) toward the corpus's leading
  principal direction (each round provably raises the Rayleigh
  quotient; rounds-to-convergence depends on the spectral gap). The third iterative-algebra surface next
  to k-means and PageRank, and like PageRank the oracle UNROLLS the
  recurrence into chained CTEs with bit-identical expressions, so the
  value hash covers the whole iteration. Per round: one (vec)-keyed
  and one (pos)-keyed partial+final aggregate — X never materializes
  as a matrix and nothing driver-side sees a vector.

Float discipline per registry.py: OHLC picks are exact argmax values;
keep-latest sums round(2); the PCA loadings round at 6 with
normalization keeping magnitudes O(0.1) — summation-order noise sits
~7 orders below the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# fn_ohlc_hourly — open/high/low/close bars via argmin/argmax aggregates
# ---------------------------------------------------------------------------

_OHLC_SQL = """
WITH r AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour,
       CAST(count(*) AS BIGINT) AS n,
       round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
       round(max(value), 2) AS high,
       round(min(value), 2) AS low,
       round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close
FROM r
GROUP BY event_type, hour
ORDER BY event_type, hour
"""


@register("fn_ohlc_hourly", _OHLC_SQL)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the downsampling compaction
    that turns a raw event stream into a metrics series.

    Spark side: open/close are ``min(struct(ts, event_id, value))`` /
    ``max(struct(...))`` — argmin/argmax as ORDINARY aggregates, so
    the whole query is ONE partial+final aggregate (SortAggregate —
    struct buffers aren't hash-buffer types — but the property that
    matters is the map-side combine): each mapper reduces its split to
    one candidate bar per (type, hour) before the shuffle. The oracle uses the equivalent
    row_number()=1 formulation (identical by the unique (ts, event_id)
    total order) — two different mechanisms, one hash. The window
    variant would shuffle-and-sort EVERY raw event; at 100 TB the
    difference is the whole query."""
    ev = load_table(
        spark, sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    hour = F.date_trunc("hour", F.col("ts"))
    o = F.min(F.struct("ts", "event_id", "value"))
    c = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy("event_type", hour.alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.round(o.getField("value"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(c.getField("value"), 2).alias("close"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH").alias("hour"),
            "n",
            "open",
            "high",
            "low",
            "close",
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# pipe_keep_latest_k — retention: latest K changelog records per key
# ---------------------------------------------------------------------------

_KEEP_K = 3

_KEEP_SQL = f"""
WITH r AS (
  SELECT user_id, value,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(ts_us) AS BIGINT) AS oldest_kept_us,
       CAST(max(ts_us) AS BIGINT) AS newest_kept_us,
       round(sum(value), 2) AS kept_value
FROM r WHERE rn <= {_KEEP_K}
GROUP BY user_id
ORDER BY user_id
"""


@register("pipe_keep_latest_k", _KEEP_SQL)
def q_keep_latest_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy compaction: each user's latest 3 changelog
    records survive; reported per user as count, kept time range, and
    kept value sum. The generalization of ``rel_cdc_latest_state``
    (K = 1) that versioned stores actually run.

    One ranked window + one aggregate on the same shuffle key. The
    ``rn <= K`` predicate is recognized by Spark's window-group-limit
    optimization: each sort keeps only a K-row-per-key heap rather
    than fully sorting rows it will drop — the property that makes
    retention over a 100 TB changelog a single bounded pass."""
    ev = load_table(
        spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    kept = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _KEEP_K)
    return (
        kept.groupBy("user_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.min(F.unix_micros("ts")).alias("oldest_kept_us"),
            F.max(F.unix_micros("ts")).alias("newest_kept_us"),
            F.round(F.sum("value"), 2).alias("kept_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# emb_pca_power_iteration — leading principal direction, matrix-free
# ---------------------------------------------------------------------------

# v0 is the uniform unit vector (1/8 per component for d = 64); two rounds
# of v <- normalize(X^T (X v)). The oracle unrolls both rounds with the
# IDENTICAL expressions (sum(val) * (1.0/8.0), w/nrm), so every double is
# bit-equal modulo summation order, absorbed by round(6).
_PCA_SQL = """
WITH comp AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
s1 AS (SELECT vec_id, sum(val) * (1.0/8.0) AS s FROM comp GROUP BY vec_id),
w1 AS (
  SELECT c.pos, sum(c.val * s1.s) AS w
  FROM comp c JOIN s1 ON s1.vec_id = c.vec_id GROUP BY c.pos
),
n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
v1 AS (SELECT pos, w / nullif(nrm, 0) AS v FROM w1 CROSS JOIN n1),
s2 AS (
  SELECT c.vec_id, sum(c.val * v1.v) AS s
  FROM comp c JOIN v1 ON v1.pos = c.pos GROUP BY c.vec_id
),
w2 AS (
  SELECT c.pos, sum(c.val * s2.s) AS w
  FROM comp c JOIN s2 ON s2.vec_id = c.vec_id GROUP BY c.pos
),
n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2)
SELECT pos, round(w / nullif(nrm, 0), 6) AS loading
FROM w2 CROSS JOIN n2
ORDER BY pos
"""


@register("emb_pca_power_iteration", _PCA_SQL)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two matrix-free power-iteration rounds toward the leading
    principal direction of the (uncentered) embedding corpus — the
    dimensionality audit (and whitening seed) run before ANN index
    tuning; the JL projection (``emb_random_projection_profile``) is
    its data-blind complement. Each round provably increases the
    Rayleigh quotient (pinned by pytest); a production run loops the
    same two aggregates to its tolerance the way ``kmeans_fit`` does.

    Each round is two partial+final aggregates: scores s = Xv (keyed
    by vec_id), loadings w = Xᵀs (keyed by pos), then a one-row norm
    broadcast back — the Gram matrix is never formed, no step's state
    exceeds k·d, and the corpus-sized relation is touched exactly
    twice per round through whole-stage-codegen multiply-adds. The
    oracle unrolls the identical recurrence (PageRank's verification
    pattern), so the hash covers both rounds end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select("vec_id", "pos", F.col("vf").cast("double").alias("val"))
    s1 = comp.groupBy("vec_id").agg((F.sum("val") * (1.0 / 8.0)).alias("s"))
    w1 = (
        comp.join(s1, "vec_id")
        .groupBy("pos")
        .agg(F.sum(F.col("val") * F.col("s")).alias("w"))
    )
    n1 = w1.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    v1 = w1.crossJoin(F.broadcast(n1)).select(
        # nullif on the norm: a zero iterate (input orthogonal to v —
        # measure-zero but possible) must be NULL on both engines, not
        # Spark-NULL-vs-DuckDB-inf (ADVICE-r8 class, proactive; the
        # oracle mirrors the guard so expressions stay identical)
        "pos", (F.col("w") / F.nullif(F.col("nrm"), F.lit(0.0))).alias("v")
    )
    s2 = (
        comp.join(F.broadcast(v1), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("val") * F.col("v")).alias("s"))
    )
    w2 = (
        comp.join(s2, "vec_id")
        .groupBy("pos")
        .agg(F.sum(F.col("val") * F.col("s")).alias("w"))
    )
    n2 = w2.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return (
        w2.crossJoin(F.broadcast(n2))
        .select(
            "pos",
            F.round(
                F.col("w") / F.nullif(F.col("nrm"), F.lit(0.0)), 6
            ).alias("loading"),
        )
        .orderBy("pos")
    )
