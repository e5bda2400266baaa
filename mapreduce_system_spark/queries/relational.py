"""Relational queries over the star schema, each with a DuckDB oracle.

The reference can express joins/aggregations through map-tag + shuffle +
reduce (Dean & Ghemawat §2, cited at reference README.MD:5) but ships no
relational code — SURVEY.md §2b marks these rows ABSENT and mandates them
as build surface. Each query here is the Catalyst-first formulation:
broadcast hash joins for dimensions, shuffled hash/sort-merge for
fact-fact, partial+final aggregation everywhere (the combiner the
reference omits, README.MD:31-38).

Scale notes (100 TB stance):
- Dimension joins (`region`/`nation`/`supplier`/`customer`) broadcast —
  zero shuffle of the fact side for the join itself.
- Fact-fact (`orders`⋈`lineitem`) shuffles both sides on the join key;
  AQE skew-split handles hot orderkeys.
- Window queries partition by a group key — no global-window single
  partition anywhere.
- `cube`/`rollup`/grouping-sets expand rows *after* partial aggregation,
  so shuffle volume scales with distinct group count, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import relational as REL
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table, register_views


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_REGION_REVENUE_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@register("rel_broadcast_join_region_revenue", _REGION_REVENUE_SQL)
def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact → 3 broadcast dimension hops → hash agg. The plan must contain
    only BroadcastHashJoin (asserted in tests/test_relational.py) — the
    fact table is never shuffled for the join."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    sup = load_table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = load_table(spark, sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = load_table(spark, sf_dir, "region", columns=["r_regionkey", "r_name"])
    joined = REL.broadcast_dim(li, sup, li.l_suppkey == sup.s_suppkey)
    joined = REL.broadcast_dim(joined, nat, joined.s_nationkey == nat.n_nationkey)
    joined = REL.broadcast_dim(joined, reg, joined.n_regionkey == reg.r_regionkey)
    return (
        joined.groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name")
    )


_FACT_FACT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_orderkey) AS n_orders,
       round(sum(l_extendedprice), 2) AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("rel_join_fact_fact", _FACT_FACT_SQL)
def q_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle on orderkey (shuffled hash /
    sort-merge — AQE picks; skew-split on). At 100 TB co-locate by
    bucketing both tables on orderkey to eliminate this shuffle."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


@register("rel_semi_join", _SEMI_SQL)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi join; the o_totalprice predicate is pushed into
    the orders parquet scan before the join (asserted in tests)."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.where(F.col("o_totalprice") > 450000).select("o_custkey")
    return REL.semi_join(cust, big, cust.c_custkey == big.o_custkey).orderBy("c_custkey")


_ANTI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


@register("rel_anti_join", _ANTI_SQL)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join (customers with no high-value order)."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.where(F.col("o_totalprice") > 450000).select("o_custkey")
    return REL.anti_join(cust, big, cust.c_custkey == big.o_custkey).orderBy("c_custkey")


# The same ANSI text runs on both engines — the SQL-API entry point
# (spark.sql over registered views) demonstrated on a TPC-H Q3 shape.
_SQL_Q3 = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("rel_sql_api_q3", _SQL_Q3)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: identical ANSI text executes on Spark (over
    registered temp views) and on the DuckDB oracle — Catalyst still
    broadcasts the dims and pushes the segment filter into the scan."""
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_SQL_Q3)


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         round(o_totalprice, 2) AS price,
         CAST(row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders)
WHERE rn <= 3
ORDER BY o_orderpriority, rn
"""


@register("rel_topk_per_group", _TOPK_SQL)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: one shuffle on the group key, per-partition rank,
    early filter — never a global sort. (orderkey tie-break = total order.)"""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    out = REL.top_k_per_group(
        orders, ["o_orderpriority"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=3
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "rn",
    ).orderBy("o_orderpriority", "rn")


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC NULLS LAST, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_sum
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("rel_running_agg", _RUNNING_SQL)
def q_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer over order time (frame: unbounded
    preceding..current). Partitioned window — scales with per-key history,
    not table size."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    # asc_nulls_last on the time key: a NULL order date must sit at the
    # END of the cumulative history on both engines (Spark ASC defaults
    # NULLS FIRST, DuckDB NULLS LAST — the fresh8e class, here on a
    # running frame rather than a rank)
    out = REL.running_agg(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey")],
        "o_totalprice",
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("running_sum", 2).alias("running_sum")
    ).orderBy("o_custkey", "o_orderkey")


_LAG_RANK_SQL = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


@register("rel_window_lag_rank", _LAG_RANK_SQL)
def q_window_lag_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic (lag) + ranking (rank) windows in one pass; both windows
    partition by the same key so Catalyst reuses one shuffle."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    # asc_nulls_last: NULL order dates lag-chain at the END on both
    # engines (fresh8e class); the DESC rank already agrees (both
    # engines default DESC NULLS LAST)
    w_time = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"
    )
    w_rank = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w_time), 2).alias("prev_price"),
            F.rank().over(w_rank).cast("long").alias("rnk"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_SET_OPS_SQL = """
SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS cnt FROM
  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS cnt FROM
  (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
UNION ALL
SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS cnt FROM
  (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)
ORDER BY op
"""


@register("rel_set_ops", _SET_OPS_SQL)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI UNION/INTERSECT/EXCEPT (distinct semantics) cardinalities of
    the customer-key universe vs the ordering-customer set."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey"])
    ordk = load_table(spark, sf_dir, "orders", columns=["o_custkey"]).withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    return REL.set_op_counts(cust, ordk)


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: cube / rollup / grouping sets / distinct
# ---------------------------------------------------------------------------

# Subtotal sentinels come from GROUPING(), not coalesce: a real NULL data
# group must stay NULL (distinct from the 'ALL' subtotal row), or subtotal
# and data rows collide on identical display keys and the ordering loses
# its unique tie-break. NULLS LAST pins the two engines' (and any NULL
# group's) sort agreement explicitly.
_CUBE_SQL = """
SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rflag,
       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS lstatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS cnt
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY rflag NULLS LAST, lstatus NULLS LAST
"""


@register("rel_cube", _CUBE_SQL)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — 2^2 grouping sets in one pass.
    Expansion happens after partial agg, so shuffled rows ∝ distinct
    groups × 4, not input rows × 4."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("cnt"),
            # grouping() is only legal inside the agg — carried out, then
            # folded into the sentinel (see _CUBE_SQL note)
            F.grouping("l_returnflag").alias("__gr"),
            F.grouping("l_linestatus").alias("__gl"),
        )
        .select(
            F.when(F.col("__gr") == 1, F.lit("ALL")).otherwise(F.col("l_returnflag")).alias("rflag"),
            F.when(F.col("__gl") == 1, F.lit("ALL")).otherwise(F.col("l_linestatus")).alias("lstatus"),
            "sum_qty",
            "cnt",
        )
        .orderBy(F.col("rflag").asc_nulls_last(), F.col("lstatus").asc_nulls_last())
    )


_ROLLUP_SQL = """
SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY priority NULLS LAST, status NULLS LAST
"""


@register("rel_rollup", _ROLLUP_SQL)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals priority → (priority,status) → grand."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderpriority").alias("__gp"),
            F.grouping("o_orderstatus").alias("__gs"),
        )
        .select(
            F.when(F.col("__gp") == 1, F.lit("ALL")).otherwise(F.col("o_orderpriority")).alias("priority"),
            F.when(F.col("__gs") == 1, F.lit("ALL")).otherwise(F.col("o_orderstatus")).alias("status"),
            "cnt",
            "total",
        )
        .orderBy(F.col("priority").asc_nulls_last(), F.col("status").asc_nulls_last())
    )


_GSETS_SQL = """
SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rflag,
       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS lstatus,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY rflag NULLS LAST, lstatus NULLS LAST
"""


@register("rel_grouping_sets", _GSETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((rflag),(lstatus)) — two independent
    groupings in one shuffle instead of a union of two aggregations."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
    return (
        li.groupingSets([["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.grouping("l_returnflag").alias("__gr"),
            F.grouping("l_linestatus").alias("__gl"),
        )
        .select(
            F.when(F.col("__gr") == 1, F.lit("ALL")).otherwise(F.col("l_returnflag")).alias("rflag"),
            F.when(F.col("__gl") == 1, F.lit("ALL")).otherwise(F.col("l_linestatus")).alias("lstatus"),
            "sum_price",
        )
        .orderBy(F.col("rflag").asc_nulls_last(), F.col("lstatus").asc_nulls_last())
    )

