"""Round-8 additions (eighth batch — registered past the 50-query driver
window behind fresh8f/fresh8g; all three rotate first in r9).

Six operators closing operational gaps a production pipeline hits
daily:

- ``graph_bfs_reachability`` — multi-source BFS hop distance over the
  customer–supplier co-transaction graph, verified against a DuckDB
  ``WITH RECURSIVE`` oracle. The iterative frontier expansion the
  reference's single map→reduce pass (coordinator.go:126-141) cannot
  chain; the third graph workload next to PageRank and triangles.
- ``agg_grouped_linreg`` — per-brand least-squares fit of extended
  price against quantity (slope / intercept / r²) from algebraic
  aggregates only: constant-size partial state, map-side combine, one
  shuffle of 25 groups regardless of corpus size.
- ``fn_time_weighted_avg`` — TWAP per user: each event's value
  weighted by its exact µs holding duration (lead-to-next). The
  time-series sibling of ``fn_ewma_user_value`` — duration-weighted
  where EWMA is recency-weighted.
- ``rel_histogram_equi_depth`` — decile (equi-depth) histogram of
  order value per priority: rank-based bucket assignment over the
  disk-backed per-group sort (``agg_quantiles``'s spill-safe posture),
  NOT a memory-buffering percentile aggregate. The equi-width twin is
  ``rel_histogram_equi_width``.
- ``rel_skew_profile`` — the diagnose-before-you-salt operator: per-key
  row counts of a join key, the top heavy keys with share and
  skew-vs-uniform ratio. What a 100 TB operator runs FIRST to decide
  whether ``skew_salted_join``'s treatment is needed.
- ``rel_snapshot_diff`` — snapshot reconciliation: classify every key
  across two table versions as added / removed / changed / unchanged
  via one full-outer join. The audit twin of ``sink_merge_upsert``'s
  write path and ``pipe_incremental_dedup``'s content check.

Float discipline per registry.py: exact integers wherever possible
(hop counts, µs durations, integer-division bucket ids, md5 buckets);
where doubles divide, both engines divide the SAME exact operands so
the quotient is bit-identical before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators.graph import bfs_hops
from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# graph_bfs_reachability — multi-source BFS vs a recursive-CTE oracle
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 4
_BFS_SEED_NATION = "NATION_0"

# Node encoding disambiguates the two key spaces: customer c ↦ 2c,
# supplier s ↦ 2s+1. An edge links a customer to every supplier whose
# part appears in one of the customer's orders.
_BFS_SQL = f"""
WITH RECURSIVE
e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
seeds AS (
  SELECT s.s_suppkey * 2 + 1 AS node
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_BFS_SEED_NATION}'
),
bfs AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.v AS node, b.hop + 1 AS hop
  FROM bfs b JOIN e ON e.u = b.node
  WHERE b.hop < {_BFS_MAX_HOPS}
),
dist AS (SELECT node, min(hop) AS hop FROM bfs GROUP BY node),
nodes AS (SELECT DISTINCT u AS node FROM e)
SELECT CAST(coalesce(d.hop, -1) AS INT) AS hop,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM nodes LEFT JOIN dist d ON d.node = nodes.node
GROUP BY 1
ORDER BY 1
"""


@register("graph_bfs_reachability", _BFS_SQL)
def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many graph nodes sit at each hop distance from the suppliers
    of one nation, over the undirected customer–supplier
    co-transaction graph (hop −1 = unreachable within the cap).

    Spark runs the frontier recurrence (``operators/graph.py::
    bfs_hops`` — per-round one equi-join + one left-anti, checkpointed
    frontiers); DuckDB runs a genuine ``WITH RECURSIVE`` — two
    entirely different iteration mechanisms agreeing on the exact
    integer hop census. Edge construction is one distinct equi-join of
    the two fact tables; the seed set is a broadcast-sized dimension
    filter."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    e0 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    e = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    supp = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_name"])
    seeds = (
        supp.join(
            F.broadcast(nat.where(F.col("n_name") == _BFS_SEED_NATION)),
            supp["s_nationkey"] == nat["n_nationkey"],
        )
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    dist = bfs_hops(e, seeds, max_hops=_BFS_MAX_HOPS)
    nodes = e0.select(F.col("u").alias("node")).union(
        e0.select(F.col("v").alias("node"))
    ).distinct()
    return (
        nodes.join(dist, "node", "left")
        .select(F.coalesce(F.col("hop"), F.lit(-1)).cast("int").alias("hop"))
        .groupBy("hop")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("hop")
    )


# ---------------------------------------------------------------------------
# agg_grouped_linreg — per-group least squares from algebraic aggregates
# ---------------------------------------------------------------------------

# r² is spelled covar²/(var_x·var_y) over PAIRWISE-complete rows with a
# nullif'd denominator instead of corr()²: under ANSI Spark's corr ABORTS
# THE JOB with DIVIDE_BY_ZERO on any zero-variance group (the
# agg_moments_profile class, r11 fuzz) — one constant-valued brand at
# 100 TB would kill the whole fit; DuckDB's corr NULLs it.
_LINREG_SQL = """
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n,
       round(covar_samp(l.l_quantity, l.l_extendedprice)
             / nullif(var_samp(l.l_quantity), 0), 4) AS slope,
       round(avg(l.l_extendedprice)
             - covar_samp(l.l_quantity, l.l_extendedprice)
               / nullif(var_samp(l.l_quantity), 0)
               * avg(l.l_quantity), 4) AS intercept,
       round(covar_samp(l.l_quantity, l.l_extendedprice)
             * covar_samp(l.l_quantity, l.l_extendedprice)
             / nullif(
                 var_samp(CASE WHEN l.l_quantity IS NOT NULL
                                AND l.l_extendedprice IS NOT NULL
                           THEN l.l_quantity END)
                 * var_samp(CASE WHEN l.l_quantity IS NOT NULL
                                  AND l.l_extendedprice IS NOT NULL
                             THEN l.l_extendedprice END),
                 0
               ), 6) AS r2
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
ORDER BY 1
"""


def _linreg_slope(x: Column, y: Column) -> Column:
    """cov(x,y)/var(x) with the degenerate-group guard: a single-row or
    constant-x group must yield NULL on BOTH engines — unguarded,
    Spark's non-ANSI x/0 gives NULL but DuckDB's IEEE division gives
    inf/NaN, a latent cross-engine hash divergence. Module-level so the
    degenerate-input pytest exercises the exact expression the
    registered query ships (not a re-typed copy that could drift)."""
    return F.covar_samp(x, y) / F.nullif(F.var_samp(x), F.lit(0))


@register("agg_grouped_linreg", _LINREG_SQL)
def q_grouped_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of extended price on quantity per part brand:
    slope = cov(x,y)/var(x), intercept through the means, r² = corr².

    The model-fit-per-segment primitive (feature pipelines fit
    thousands of these). Everything is an algebraic aggregate with
    constant-size partial state — Catalyst runs the whole fit
    partial+final with map-side combine, exactly like
    ``agg_moments_profile``; no group's raw points are ever
    materialized. Update-order float noise vanishes under the
    rounding (the moments query's measured discipline: 4 decimals for
    price-scaled values, 6 for the dimensionless r²)."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    part = load_table(spark, sf_dir, "part", columns=["p_partkey", "p_brand"])
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    slope = _linreg_slope(x, y)  # nullif-guarded (see helper docstring)
    # r² = covar²/(var·var) over pairwise-complete rows, NOT F.corr()²:
    # under ANSI corr aborts the job on a zero-variance group (the
    # agg_moments_profile class — r11 fuzz); the explicit algebra NULLs
    # it on both engines and stays expression-mirrored with the oracle
    pair_ok = x.isNotNull() & y.isNotNull()
    cov = F.covar_samp(x, y)
    r2 = (cov * cov) / F.nullif(
        F.var_samp(F.when(pair_ok, x)) * F.var_samp(F.when(pair_ok, y)), F.lit(0.0)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n"),
            F.round(slope, 4).alias("slope"),
            F.round(F.avg(y) - slope * F.avg(x), 4).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# fn_time_weighted_avg — TWAP per user over exact µs holding durations
# ---------------------------------------------------------------------------

_TWAP_SQL = """
WITH d AS (
  SELECT user_id, value,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              - epoch_us(ts) AS BIGINT) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
       round(sum(value * dur_us) / nullif(sum(dur_us), 0), 4) AS twap
FROM d
GROUP BY user_id
ORDER BY user_id
"""


@register("fn_time_weighted_avg", _TWAP_SQL)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value holds
    until the next event and is weighted by that exact µs duration
    (the last event carries no weight — its holding period is open).

    The standard TWAP/occupancy statistic for irregular time series,
    where the plain mean over-counts bursts. ONE window (lead over the
    user/ts order) and ONE aggregation sharing the same shuffle key;
    durations are exact BIGINT µs on both engines, so the weighted-sum
    operands are bit-identical and only summation order is absorbed by
    the rounding. A user with a single event yields NULL twap on both
    engines (no closed holding period); a user whose events all share
    ONE timestamp would make ``sum(dur_us) = 0``, where Spark's
    non-ANSI division yields NULL but DuckDB's IEEE division yields
    NaN — the nullif guard pins both engines to NULL (the ADVICE-r8
    degenerate-division class, applied proactively)."""
    ev = load_table(
        spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us"))
                / F.nullif(F.sum("dur_us"), F.lit(0)),
                4,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# rel_histogram_equi_depth — rank-assigned deciles, spill-safe per group
# ---------------------------------------------------------------------------

_EQUI_DEPTH_SQL = """
WITH r AS (
  SELECT o_orderpriority AS priority, o_totalprice AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC NULLS LAST, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM orders
)
SELECT priority,
       CAST(((rn - 1) * 10) // cnt + 1 AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(v), 2) AS lo,
       round(max(v), 2) AS hi,
       round(avg(v), 4) AS avg_value
FROM r
GROUP BY priority, decile
ORDER BY priority, decile
"""


@register("rel_histogram_equi_depth", _EQUI_DEPTH_SQL)
def q_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order value per priority:
    bucket by rank — decile = ⌊(rn−1)·10 / n⌋ + 1 over the
    (value, key)-ordered rows — then per-bucket count/min/max/mean.

    ``rel_histogram_equi_width``'s dual: equal POPULATION per bucket
    instead of equal width, the form quantile-calibration and
    monotonic-binning steps need. The per-group sort runs in Spark's
    disk-backed external sorter (``agg_quantiles``'s spill-safe
    posture — groups parallelize across executors and no task buffers
    a group in memory); the per-group counts ride in via a broadcast
    join rather than an unbounded-frame count window (measured 2×
    slower and memory-buffering there). Bucket ids are exact integer
    division on both engines — no float in the assignment. At 100 TB
    a GLOBAL equi-depth histogram should instead take cutpoints from
    ``approx_percentile`` (``agg_approx_quantiles``) and bucket
    map-only; this exact form is the per-group workhorse."""
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    cnts = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("cnt")
    )
    r = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("v"),
        F.row_number()
        # asc_nulls_last mirrors DuckDB's ASC default (fresh8e class) —
        # o_totalprice is non-null by TPC-H contract, pinned for free
        .over(
            W.partitionBy("o_orderpriority").orderBy(
                F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
            )
        )
        .alias("rn"),
    ).join(F.broadcast(cnts), "priority")
    decile = F.expr("CAST(((rn - 1) * 10) DIV cnt AS INT) + 1").alias("decile")
    return (
        r.select("priority", "v", decile)
        .groupBy("priority", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
            F.round(F.avg("v"), 4).alias("avg_value"),
        )
        .orderBy("priority", "decile")
    )


# ---------------------------------------------------------------------------
# rel_skew_profile — diagnose key skew before choosing a join strategy
# ---------------------------------------------------------------------------

_SKEW_TOP = 5

_SKEW_SQL = f"""
WITH c AS (
  SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys
  FROM c
)
SELECT c.suppkey, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share,
       round(CAST(c.cnt AS DOUBLE) * CAST(t.n_keys AS DOUBLE)
             / CAST(t.total AS DOUBLE), 6) AS skew_ratio
FROM c CROSS JOIN t
ORDER BY c.cnt DESC, c.suppkey
LIMIT {_SKEW_TOP}
"""


@register("rel_skew_profile", _SKEW_SQL)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heaviest join keys of lineitem.l_suppkey with their share of
    all rows and their skew ratio vs a uniform spread (cnt·k / total).

    The diagnostic a 100 TB operator runs BEFORE a big join: a
    skew_ratio near 1 says hash partitioning balances; ≫1 names the
    keys that need ``skew_salted_join``'s salting or AQE's skew split.
    Two chained partial+final aggregates (per-key counts, then one-row
    totals) and a broadcast of the one-row totals back onto the counts;
    the top-k is TakeOrderedAndProject — per-partition heaps, never a
    global sort. Ratios divide exact integer operands, so both engines
    produce the identical double before rounding."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_suppkey"])
    c = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count("*").alias("cnt")
    )
    t = c.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "suppkey",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total").cast("double"), 6)
            .alias("share"),
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), "suppkey")
        .limit(_SKEW_TOP)
    )


# ---------------------------------------------------------------------------
# rel_snapshot_diff — full-outer reconciliation of two table versions
# ---------------------------------------------------------------------------

# The two "snapshots" are deterministic md5 buckets of orders (the same
# bucketing primitive as pipe_hash_split): v1 = buckets 0-94, v2 =
# buckets 5-99 with the status field mutated on buckets 5-14. So the
# expected classes are: added = 95-99, removed = 0-4, changed = 5-14,
# unchanged = 15-94 — every class non-empty by construction.
_DIFF_SQL = f"""
WITH b AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
         {md5_bucket32_sql("CAST(o_orderkey AS VARCHAR)")} % 100 AS bk
  FROM orders
),
v1 AS (
  SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p, o_orderpriority AS pr
  FROM b WHERE bk < 95
),
v2 AS (
  SELECT o_orderkey AS k,
         CASE WHEN bk < 15 THEN 'X' ELSE o_orderstatus END AS s,
         o_totalprice AS p, o_orderpriority AS pr
  FROM b WHERE bk >= 5
)
SELECT CASE WHEN v1.k IS NULL THEN 'added'
            WHEN v2.k IS NULL THEN 'removed'
            WHEN v1.s <> v2.s OR v1.p <> v2.p OR v1.pr <> v2.pr THEN 'changed'
            ELSE 'unchanged' END AS diff_class,
       CAST(count(*) AS BIGINT) AS n
FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
GROUP BY 1
ORDER BY 1
"""


@register("rel_snapshot_diff", _DIFF_SQL)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two snapshots of the orders table: classify every key
    as added / removed / changed / unchanged and count each class.

    The audit operation behind every incremental pipeline — "what did
    yesterday's run change?" — and the read-side complement of
    ``sink_merge_upsert``. ONE full-outer equi-join on the unique key
    with a struct comparison for the changed test, then a tiny
    aggregate: the join key is uniformly distributed (skew-free) and
    AQE sizes the exchange; in production both snapshots live in the
    bucketed layout ``sink_bucketed_join_roundtrip`` demonstrates,
    making the daily diff shuffle-free. The synthetic v1/v2 split uses
    the catalog's standard md5 bucketing so both engines carve
    bit-identical snapshots."""
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    bk = md5_bucket32(F.col("o_orderkey").cast("string")) % 100
    b = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderpriority").alias("pr"),
        bk.alias("bk"),
    )
    v1 = b.where(F.col("bk") < 95).select("k", "s", "p", "pr")
    v2 = b.where(F.col("bk") >= 5).select(
        "k",
        F.when(F.col("bk") < 15, F.lit("X")).otherwise(F.col("s")).alias("s"),
        "p",
        "pr",
    )
    j = v1.alias("a").join(v2.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    changed = (
        (F.col("a.s") != F.col("b.s"))
        | (F.col("a.p") != F.col("b.p"))
        | (F.col("a.pr") != F.col("b.pr"))
    )
    cls = (
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(cls.alias("diff_class"))
        .groupBy("diff_class")
        .agg(F.count("*").alias("n"))
        .orderBy("diff_class")
    )
