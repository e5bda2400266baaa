"""Round-8 additions (fourth batch): relational + embedding surface.

- ``rel_histogram_equi_width`` — equi-width histogram of order totals:
  global [min, max] (one 1-row aggregate, broadcast back) → 16 fixed
  buckets with explicit bounds. The profiling primitive behind every
  data-quality dashboard; one scan + one tiny rollup at any scale.
- ``rel_window_cume_ntile`` — the distribution-rank window family the
  catalog lacked (ntile / cume_dist / percent_rank) over one shared
  window spec: one exchange + one sort feeds all three.
- ``asof_join_nearest`` — nearest-in-time as-of join (pandas
  ``merge_asof(direction='nearest')`` semantics, backward wins ties),
  via operators/asof.py::asof_join_nearest: backward and forward
  propagation over ONE union window (one exchange, two sorts), gap
  comparison in exact epoch-µs longs. The DuckDB twin composes two
  native ASOF JOINs (>= and <=) and picks per row — a genuinely
  independent formulation of the same semantics.
- ``emb_hof_vector_stats`` — per-vector norms/sparsity via
  higher-order functions only (transform/aggregate/filter/array_max):
  the JVM-side way to profile an embedding column with zero Python and
  zero explode-shuffle (everything is computed inside the row). The
  DuckDB twin uses list comprehensions + list_reduce, which fold in
  the same left-to-right order, so doubles agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators.asof import asof_join_nearest, latest_per_key_time
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# rel_histogram_equi_width
# ---------------------------------------------------------------------------

_N_BUCKETS = 16

_HIST_SQL = f"""
WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
b AS (
  SELECT CAST(least({_N_BUCKETS - 1}, floor(((o_totalprice - mn) / nullif(mx - mn, 0)) * {_N_BUCKETS}.0)) AS BIGINT) AS bucket,
         o_totalprice, mn, mx
  FROM orders CROSS JOIN mm
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(mn + CAST(bucket AS DOUBLE) * ((mx - mn) / {_N_BUCKETS}.0), 2) AS lo,
       round(mn + (CAST(bucket AS DOUBLE) + 1.0) * ((mx - mn) / {_N_BUCKETS}.0), 2) AS hi,
       round(sum(o_totalprice), 2) AS revenue
FROM b
GROUP BY bucket, mn, mx
ORDER BY bucket
"""


@register("rel_histogram_equi_width", _HIST_SQL)
def q_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bucket equi-width histogram of o_totalprice with explicit
    bucket bounds. Shape: 1-row min/max aggregate broadcast back onto
    the scan (no second full-table pass materializes anything), then
    one 16-row rollup — the same two-job profile at 100 TB."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_totalprice"])
    mm = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    v, mn, mx = F.col("o_totalprice"), F.col("mn"), F.col("mx")
    nb = float(_N_BUCKETS)
    # nullif on the range: a constant column (mx = mn) must bucket to
    # NULL on both engines — unguarded, Spark's non-ANSI x/0 is NULL but
    # DuckDB's IEEE division is NaN (ADVICE-r8 class, proactive)
    bucket = F.least(
        F.lit(_N_BUCKETS - 1),
        F.floor(((v - mn) / F.nullif(mx - mn, F.lit(0))) * nb),
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(mm))
        .select(bucket.alias("bucket"), "o_totalprice", "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            "bucket",
            "n_orders",
            F.round(mn + F.col("bucket").cast("double") * ((mx - mn) / nb), 2).alias("lo"),
            F.round(mn + (F.col("bucket").cast("double") + 1.0) * ((mx - mn) / nb), 2).alias("hi"),
            "revenue",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# rel_window_cume_ntile
# ---------------------------------------------------------------------------

_CUME_SQL = """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       round(cume_dist() OVER w, 6) AS cume,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC NULLS LAST, c_custkey)
ORDER BY c_custkey
"""


@register("rel_window_cume_ntile", _CUME_SQL)
def q_window_cume_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family — ntile(4) quartile, cume_dist,
    percent_rank — over customers by account balance within market
    segment. All three share one window spec, so the plan carries ONE
    exchange and ONE sort; the (c_acctbal, c_custkey) order is unique,
    making every rank deterministic."""
    cust = load_table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )
    # asc_nulls_last: a NULL c_acctbal must rank LAST on both engines
    # (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST — fresh8e class)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_last(), "c_custkey"
    )
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# asof_join_nearest
# ---------------------------------------------------------------------------

_ASOF_NEAREST_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), r1 AS (SELECT * FROM r WHERE rn = 1),
b AS (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey AS k, o.o_totalprice AS p, CAST(o.o_orderdate AS TIMESTAMP) AS rt
  FROM events e ASOF LEFT JOIN r1 o
    ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
),
f AS (
  SELECT e.event_id,
         o.o_orderkey AS k, o.o_totalprice AS p, CAST(o.o_orderdate AS TIMESTAMP) AS rt
  FROM events e ASOF LEFT JOIN r1 o
    ON e.user_id = o.o_custkey AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP)
)
SELECT b.event_id, b.user_id,
       CASE WHEN b.k IS NOT NULL AND (f.k IS NULL
                 OR (epoch_us(b.ts) - epoch_us(b.rt)) <= (epoch_us(f.rt) - epoch_us(b.ts)))
            THEN b.k ELSE f.k END AS nearest_orderkey,
       round(CASE WHEN b.k IS NOT NULL AND (f.k IS NULL
                 OR (epoch_us(b.ts) - epoch_us(b.rt)) <= (epoch_us(f.rt) - epoch_us(b.ts)))
            THEN b.p ELSE f.p END, 2) AS nearest_price,
       CASE WHEN b.k IS NOT NULL AND (f.k IS NULL
                 OR (epoch_us(b.ts) - epoch_us(b.rt)) <= (epoch_us(f.rt) - epoch_us(b.ts)))
            THEN epoch_us(b.ts) - epoch_us(b.rt)
            ELSE epoch_us(f.rt) - epoch_us(b.ts) END AS gap_us
FROM b JOIN f USING (event_id)
ORDER BY b.event_id
"""


@register("asof_join_nearest", _ASOF_NEAREST_SQL)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join of events onto each user's order
    history (|order_date − event_ts| minimized, backward wins ties),
    reporting the matched order and the exact µs gap. The oracle
    composes DuckDB's native backward (>=) and forward (<=) ASOF JOINs
    and picks per row — independent machinery, same semantics."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    r1 = latest_per_key_time(
        orders, key="o_custkey", time_col="o_orderdate", tiebreak="o_orderkey"
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join_nearest(
        ev, r1,
        on="user_id", left_time="ts", right_time="o_ts",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    gap = F.abs(F.unix_micros("ts") - F.col("__matched_time_long"))
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.round("o_totalprice", 2).alias("nearest_price"),
        gap.alias("gap_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# emb_hof_vector_stats
# ---------------------------------------------------------------------------

_HOF_SQL = """
WITH v AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS e
  FROM embeddings
)
SELECT vec_id, label,
       CAST(len(e) AS BIGINT) AS dim,
       round(sqrt(list_reduce([x * x for x in e], (a, b) -> a + b)), 6) AS l2_norm,
       round(list_reduce(e, (a, b) -> a + b) / len(e), 6) AS mean,
       CAST(len(list_filter(e, x -> abs(x) > 0.05)) AS BIGINT) AS n_large,
       round(list_aggregate([abs(x) for x in e], 'max'), 6) AS max_abs
FROM v
ORDER BY vec_id
"""


@register("emb_hof_vector_stats", _HOF_SQL)
def q_hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding profile computed entirely with higher-order
    functions — transform / aggregate (left fold) / filter / array_max —
    i.e. inside the row, JVM-side, with no explode, no shuffle beyond
    the final sort, and no Python. The left-fold accumulation order is
    identical to DuckDB's list_reduce, so the doubles match exactly.
    (Precondition: non-empty vectors — the fixture's are fixed-width.)"""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    e = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select("vec_id", "label", e.alias("e"))
    acc = F.lit(0.0)
    l2 = F.sqrt(
        F.aggregate(F.transform("e", lambda x: x * x), acc, lambda a, x: a + x)
    )
    mean = F.aggregate("e", acc, lambda a, x: a + x) / F.size("e")
    n_large = F.size(F.filter("e", lambda x: F.abs(x) > 0.05))
    max_abs = F.array_max(F.transform("e", lambda x: F.abs(x)))
    return (
        v.select(
            "vec_id",
            "label",
            F.size("e").cast("long").alias("dim"),
            F.round(l2, 6).alias("l2_norm"),
            F.round(mean, 6).alias("mean"),
            n_large.cast("long").alias("n_large"),
            F.round(max_abs, 6).alias("max_abs"),
        )
        .orderBy("vec_id")
    )
