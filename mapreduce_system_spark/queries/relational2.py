"""Relational catalog, part 2: outer-join / pivot / unpivot reshapes and
distinct/approx-distinct/star aggregation.

Split out of ``queries/relational.py`` purely for registration-order
control: the driver's correctness sweep covers the first 50 registered
queries, and these six carried the catalog's oldest driver evidence
(CORRECTNESS_r04) — a separate module lets the r7 window rotate them in
without dragging the twelve freshly-r06-green relational queries along
(see queries/__init__.py). Semantics, oracles, and scale stances are
unchanged from their original registrations.

INTERNAL ORDER IS ALSO LOAD-BEARING (r17 rotation): the r16 window cut
this module at the 50-slot boundary, re-rowing only its first three
(``agg_distinct_stats``, ``agg_approx_distinct``, ``agg_star_pricing``);
the other three still carried r13 rows. For r17 the module sits at the
window tail again, so the three r13-stale queries
(``rel_full_outer_join``, ``rel_pivot_priority_revenue``,
``rel_unpivot_metrics``) now register FIRST and land inside the
boundary, while the r16-fresh trio spills just past it. Pure reorder —
no semantic change to any query or oracle.

Scale notes as in relational.py: exact multi-distinct expands AFTER
partial aggregation; approx_count_distinct is the 100 TB path; the
full-outer join is shuffled sort-merge by necessity; pivot with an
explicit value list is one partial+final pass; unpivot is a single
Expand, shuffle-free after its aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Outer join + pivot/unpivot (r13-stale trio — window-first, see docstring)
# ---------------------------------------------------------------------------

# Customer side filtered to every 3rd key so BOTH sides have unmatched rows:
# orders of the other customers dangle right, order-less customers dangle left.
_FULL_OUTER_SQL = """
WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0)
SELECT coalesce(c_mktsegment, '<no customer>') AS segment,
       count(o_orderkey) AS n_orders,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS customers_without_orders,
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_without_customer,
       round(sum(coalesce(o_totalprice, 0)), 2) AS revenue
FROM c FULL OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY segment
ORDER BY segment
"""


@register("rel_full_outer_join", _FULL_OUTER_SQL)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with dangling rows on both sides, null-bucket
    semantics checked exactly. Full-outer cannot broadcast (both sides
    must surface unmatched rows) — Spark plans a shuffled sort-merge join,
    the correct shape at any scale."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).where(
        F.col("c_custkey") % 3 == 0
    )
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return (
        joined.groupBy(
            F.coalesce("c_mktsegment", F.lit("<no customer>")).alias("segment")
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "customers_without_orders"
            ),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
                "orders_without_customer"
            ),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("revenue"),
        )
        .orderBy("segment")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_COLS = ["urgent", "high", "medium", "not_specified", "low"]

_PIVOT_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {", ".join(f"round(sum(CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END), 2) AS {c}"
                  for p, c in zip(_PRIORITIES, _PIVOT_COLS))}
FROM orders
GROUP BY order_year
ORDER BY order_year
"""


@register("rel_pivot_priority_revenue", _PIVOT_SQL)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue by year with one column per order priority. With the
    value list supplied, Spark pivots in a single partial+final aggregation
    pass (no second scan to discover values) — the oracle is the standard
    conditional-aggregation rewrite."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderdate", "o_orderpriority", "o_totalprice"])
    pivoted = (
        orders.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renamed = pivoted.select(
        "order_year", *[F.col(f"`{p}`").alias(c) for p, c in zip(_PRIORITIES, _PIVOT_COLS)]
    )
    return renamed.orderBy("order_year")


_UNPIVOT_SQL = """
WITH w AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_discount), 2) AS sum_disc
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, value FROM (
  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w)
ORDER BY l_returnflag, metric
"""


@register("rel_unpivot_metrics", _UNPIVOT_SQL)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-flag metric columns back to long
    (flag, metric, value) rows via Spark's native unpivot — no join, one
    Expand node, shuffle-free after the aggregation."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"])
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


# ---------------------------------------------------------------------------
# Distinct / approx-distinct / star aggregation (r16-fresh trio — past the
# r17 boundary, see docstring)
# ---------------------------------------------------------------------------

_DISTINCT_SQL = """
SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
"""


@register("agg_distinct_stats", _DISTINCT_SQL)
def q_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct aggregates in one query (Catalyst expands to
    a multi-phase expand+agg plan)."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


# The sketch value itself is implementation-defined, so the driver-checkable
# form hashes (exact, within-bound-boolean): Spark computes BOTH the HLL
# estimate and the exact distinct and emits whether the estimate sits inside
# the documented 3% band; the oracle recomputes the exact count and asserts
# the band holds (TRUE literal). A broken sketch ⇒ FALSE ⇒ hash mismatch.
_APPROX_DISTINCT_SQL = """
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_bound
FROM lineitem
"""


@register("agg_approx_distinct", _APPROX_DISTINCT_SQL)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's shuffle is unaffordable. The exact count here exists only
    to anchor the error-band check (rsd=0.01 → within ~3% of exact); the
    product operator is the sketch."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_partkey"])
    # One pre-distinct feeds BOTH aggregates: HLL is multiplicity-blind
    # (identical registers over a set and its multiset), so estimating
    # over the distinct keys gives the exact same sketch value while
    # avoiding the Expand duplication a mixed exact+approx distinct
    # aggregation would plan (measured 3.9 s → expand-free).
    dist = li.select("l_partkey").distinct()
    # count(l_partkey), not count(*): a NULL key survives the distinct as
    # one row, but count(DISTINCT ...) in the oracle and the HLL sketch
    # both ignore NULLs — count(*) would anchor the error band one high
    agg = dist.agg(
        F.count("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("approx") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.03)
        ).alias("within_bound"),
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS cnt
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("agg_star_pricing", _PRICING_SQL)
def q_star_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-heavy algebraic aggregation,
    the canonical partial+final hash-agg benchmark. The shipdate predicate
    pushes into the parquet scan."""
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
