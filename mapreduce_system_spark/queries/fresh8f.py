"""Round-8 additions (sixth batch — registered past the 50-query driver
window, first in line for the r9 rotation; see ``queries/__init__``).

Five operators widening three fronts:

- ``graph_triangle_count`` — triangle census + global transitivity of
  the part co-purchase graph (parts are adjacent when one order buys
  both). The third graph workload next to PageRank and connected
  components, and the canonical "joins can explode" stress: the naive
  wedge join is Θ(Σ d²); the degree-ordered orientation used here
  (count each triangle at its minimum-degree vertex) is the
  compact-forward algorithm that bounds wedge generation by the
  graph's arboricity — the difference between hours and minutes on a
  skewed 100 TB graph.
- ``rel_sql_api_q8_market_share`` — TPC-H Q8 re-cut to the fixture
  columns: an 8-relation join (nation twice) with conditional
  aggregation, executed from ONE ANSI string on both engines. The
  deepest join tree in the catalog — what it pins is Catalyst's join
  ordering + broadcast chaining on a star schema.
- ``fn_ewma_user_value`` — exponentially weighted moving average of
  each user's recent event values. EWMA looks inherently sequential
  (state folded event-by-event); the closed form over the K latest
  events turns it into one ranked window + one weighted aggregation.
- ``fn_linear_interpolate_daily`` — calendar-spine resampling with
  LINEAR interpolation between bracketing observations (gap-fill's
  sibling: zeros are right for counts, interpolation for level
  series). Two ignore-nulls window passes over one exchange.
- ``pipe_incremental_dedup`` — the daily-ingest operation: which of
  today's batch documents are genuinely new vs already in the corpus?
  Fingerprint left-join of the (small) batch against the (huge)
  history — the incremental complement of ``dedup_exact``'s full-corpus
  pass and the read side of ``sink_merge_upsert``'s write path.

Float discipline per registry.py: DOUBLE casts before arithmetic,
identical parenthesization both sides, rounded outputs, exact-integer
tie-breaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators.graph import triangle_stats
from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.queries._graphshared import copurchase_pairs
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table, register_views

# ---------------------------------------------------------------------------
# graph_triangle_count — degree-ordered triangle census (compact-forward)
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM pr UNION ALL SELECT v AS node FROM pr)
  GROUP BY node
),
eo AS (
  SELECT CASE WHEN (du.d, pr.u) < (dv.d, pr.v) THEN pr.u ELSE pr.v END AS s,
         CASE WHEN (du.d, pr.u) < (dv.d, pr.v) THEN pr.v ELSE pr.u END AS t
  FROM pr
  JOIN deg du ON du.node = pr.u
  JOIN deg dv ON dv.node = pr.v
),
w AS (
  SELECT e1.t AS a, e2.t AS b
  FROM eo e1 JOIN eo e2 ON e1.s = e2.s AND e1.t < e2.t
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM w JOIN pr ON pr.u = w.a AND pr.v = w.b
),
-- coalesce: sum() over an EMPTY degree table is NULL, but the operator's
-- documented empty-graph contract is n_wedges = 0 / transitivity = 0.0
-- (tests/test_graph.py pins it; the r12 graph fuzz found the divergence)
wed AS (SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) AS n_wedges FROM deg)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n_edges,
       tri.n_triangles AS n_triangles,
       wed.n_wedges AS n_wedges,
       CASE WHEN wed.n_wedges = 0 THEN 0.0
            ELSE round(3.0 * tri.n_triangles / wed.n_wedges, 6)
       END AS transitivity
FROM tri CROSS JOIN wed
"""


@register("graph_triangle_count", _TRIANGLE_SQL)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles and transitivity (3·triangles / wedges) of the part
    co-purchase graph.

    The census itself is ``operators/graph.py::triangle_stats`` (the
    compact-forward orientation and its O(E · arboricity) wedge bound
    are documented there). Edge construction here: per-order pair
    generation is quadratic only in basket size (bounded by the
    order-size cap the fixture inherits from TPC-H); unbounded baskets
    would take a basket-size cap exactly like the dedup family's
    stop-shingle DF cap."""
    pr = copurchase_pairs(spark, sf_dir)
    return triangle_stats(pr)


# ---------------------------------------------------------------------------
# rel_sql_api_q8_market_share — TPC-H Q8 shape, one string, two engines
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT yr,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END)
             / sum(volume), 6) AS mkt_share,
       round(sum(volume), 2) AS total_volume
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
         n2.n_name AS supp_nation,
         l.l_extendedprice * (1.0 - l.l_discount) AS volume
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) v
GROUP BY yr
ORDER BY yr
"""


@register("rel_sql_api_q8_market_share", _Q8_SQL)
def q_sql_api_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_7's share of PROMO-part revenue sold into ASIA, by order
    year — TPC-H Q8's shape on the fixture schema, through the SQL
    front door.

    The catalog's deepest join tree: 8 relation instances (nation
    joined twice under different roles). What the query pins is that
    Catalyst orders the tree itself — region/nation/supplier/part/
    customer broadcast in a chain onto the lineitem⋈orders fact join
    (the only shuffle), with the region and p_type filters pushed into
    their dimension scans so pruning happens BEFORE any join. Writing
    this as explicit DataFrame joins in the wrong order would shuffle
    the fact table repeatedly; declaring it lets the optimizer pick
    the star-join plan at any scale."""
    register_views(
        spark,
        sf_dir,
        ("lineitem", "part", "supplier", "nation", "orders", "customer", "region"),
    )
    return spark.sql(_Q8_SQL)


# ---------------------------------------------------------------------------
# fn_ewma_user_value — EWMA over each user's K latest events, closed form
# ---------------------------------------------------------------------------

_EWMA_K = 32  # truncation horizon: weight 2^-32 ≈ 2e-10 is far below round(6)

# alpha = 0.5 exactly: the weights pow(0.5, i) are exact powers of two, so
# weighting is an exact exponent shift on both engines — the only float
# noise left is summation order, absorbed by round(6).
_EWMA_SQL = f"""
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) - 1 AS i
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_recent,
       round(max(CASE WHEN i = 0 THEN value END), 6) AS last_value,
       round(sum(value * pow(0.5, i)) / sum(pow(0.5, i)), 6) AS ewma
FROM r
WHERE i < {_EWMA_K}
GROUP BY user_id
ORDER BY user_id
"""


@register("fn_ewma_user_value", _EWMA_SQL)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 0.5) of the 32 most recent event values.

    The sequential recurrence ewma ← α·x + (1-α)·ewma unrolls to a
    weighted sum with weights (1-α)^i over recency rank i — so the
    whole computation is ONE window (rank within user) + ONE weighted
    aggregation: a single shuffle on user_id. Truncating at K = 32
    both bounds the work per key and caps the numeric tail (dropped
    weight ≤ 2^-32, invisible at the rounded precision); Spark's
    window-group-limit optimization prunes each user's partition to
    the K kept rows during the sort rather than after it."""
    ev = load_table(
        spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )
    i = (
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        )
        - 1
    ).alias("i")
    r = ev.select("user_id", "value", i).where(F.col("i") < _EWMA_K)
    wgt = F.pow(F.lit(0.5), F.col("i"))
    return (
        r.groupBy("user_id")
        .agg(
            F.count("*").alias("n_recent"),
            F.round(F.max(F.when(F.col("i") == 0, F.col("value"))), 6).alias(
                "last_value"
            ),
            F.round(F.sum(F.col("value") * wgt) / F.sum(wgt), 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# fn_linear_interpolate_daily — spine resampling with linear interpolation
# ---------------------------------------------------------------------------

_INTERP_SQL = """
WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
                  max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
d AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
p AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
a AS (SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS v
      FROM orders GROUP BY 1, 2),
s AS (
  SELECT p.priority, d.day, a.v
  FROM d CROSS JOIN p
  LEFT JOIN a ON a.priority = p.priority AND a.day = d.day
),
f AS (
  SELECT priority, day, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM s
)
SELECT priority,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS INT) AS interpolated,
       round(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
       END, 4) AS count_filled
FROM f
ORDER BY priority, day
"""


@register("fn_linear_interpolate_daily", _INTERP_SQL)
def q_linear_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order count per priority on a full calendar spine, with
    missing days LINEARLY interpolated between the bracketing observed
    days (edges carry the nearest observation).

    Gap-fill's sibling for level series. Plan: the fact table
    aggregates first (the only data-sized shuffle); the spine is
    calendar × priority — it grows with TIME, not data, so it is
    broadcast-sized at 100 TB as much as at sf0.001. Both bracketing
    passes (backward last-non-null, forward first-non-null) share one
    (priority, day) partitioning: one exchange, two sorts.

    Exactness by construction: the interpolated series is an INTEGER
    count, so both engines hold bit-identical inputs (no summation-
    order ULP, unlike an avg-of-doubles series, where ~0.1% of rounded
    outputs straddled a half boundary); day gaps compare as exact
    integer days, and the identically-parenthesized interpolation of
    identical doubles is itself identical before the final round."""
    orders_full = load_table(
        spark, sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"]
    )
    actual = orders_full.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count("*").cast("double").alias("v"))
    bounds = orders_full.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    prios = orders_full.select(
        F.col("o_orderpriority").alias("priority")
    ).distinct()
    spine = days.crossJoin(prios)  # calendar × 5 priorities: tiny
    s = spine.join(actual, ["priority", "day"], "left")
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    wb = (
        W.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    f = s.select(
        "priority",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    t = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * t)
    )
    return f.select(
        "priority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).cast("int").alias("interpolated"),
        F.round(filled, 4).alias("count_filled"),
    ).orderBy("priority", "day")


# ---------------------------------------------------------------------------
# pipe_incremental_dedup — today's batch vs the corpus fingerprint history
# ---------------------------------------------------------------------------

_INCR_DEDUP_SQL = f"""
WITH b AS (
  SELECT lang, text,
         {md5_bucket32_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bk
  FROM documents
),
batch AS (SELECT lang, md5(text) AS fp FROM b WHERE bk >= 90),
hist AS (SELECT DISTINCT md5(text) AS fp FROM b WHERE bk < 90)
SELECT batch.lang,
       CAST(count(*) AS BIGINT) AS n_batch,
       CAST(sum(CASE WHEN hist.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new
FROM batch LEFT JOIN hist ON hist.fp = batch.fp
GROUP BY batch.lang
ORDER BY batch.lang
"""


@register("pipe_incremental_dedup", _INCR_DEDUP_SQL)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of an incoming batch is new? The md5(doc_id) ≥ 90 bucket
    plays "today's crawl" (10% of docs — same deterministic bucketing
    as ``pipe_hash_split``); the rest is the corpus history. Reported
    per language: batch size and how many batch fingerprints are
    absent from history.

    The join is on a 128-bit content fingerprint — uniformly
    distributed, skew-free by construction; the history side is
    distinct-ed to fingerprints only (the narrowest possible shuffle
    payload), and AQE sizes the join. In production the history side
    is the bucketed fingerprint sink ``sink_bucketed_join_roundtrip``
    demonstrates, making the daily run shuffle only the batch.
    (Reference contrast: its sink is write-once with no read-back
    path at all — worker.go:154-170.)"""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "lang", "text"])
    bucket = md5_bucket32(F.col("doc_id").cast("string")) % 100
    base = docs.select("lang", F.md5("text").alias("fp"), bucket.alias("bk"))
    batch = base.where(F.col("bk") >= 90).select("lang", "fp")
    hist = (
        base.where(F.col("bk") < 90)
        .select(F.col("fp").alias("hfp"))
        .distinct()
    )
    return (
        batch.join(hist, batch["fp"] == hist["hfp"], "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_batch"),
            F.sum(F.when(F.col("hfp").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .orderBy("lang")
    )
