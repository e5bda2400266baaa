"""Shared graph-query constructions — NO query registrations.

``graph_pagerank`` (queries/fresh7d.py) and ``graph_pagerank_dangling``
(queries/fresh8a.py) iterate on LONG node ids — suppliers offset into
their own id space — because fixed-width 8-byte shuffle keys beat
variable-length strings on every per-round exchange (~15% wall at
sf0.1, and the margin grows with edge count); only the final
node-count-sized result maps to the oracles' string labels. This module
is the ONE definition of the offset, the edge construction, and the
label mapping: with two hand-copies, changing the offset or the label
scheme in one query but not the other would silently mislabel that
query's nodes against its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.sources.tables import load_table

NODE_OFFSET = 1_000_000_000  # above any custkey at any fixture sf


def pagerank_iter_cte(prev: str, cur: str) -> str:
    """One unrolled damped-PageRank iteration as a DuckDB CTE — the ONE
    spelling both ``graph_pagerank`` (queries/fresh7d.py) and
    ``graph_pagerank_weighted`` (queries/graphml.py) unroll (the
    weighting lives entirely in the ``ce.w`` definition upstream, so the
    recurrence text is shared verbatim; hand-copies would let a teleport
    or coalesce tweak verify different formulas per query — the drift
    class this module exists to prevent). ``graph_pagerank_dangling``
    (queries/fresh8a.py) adds the m/N redistribution term and keeps its
    own spelling. The formula mirrors operators/graph.py::pagerank
    double-for-double: 0.15/N teleport + 0.85·Σ rank·w."""
    return f"""{cur} AS (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) * coalesce(s.contrib, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT ce.v AS node, sum({prev}.rank * ce.w) AS contrib
    FROM ce JOIN {prev} ON {prev}.node = ce.u
    GROUP BY 1
  ) s ON s.node = nodes.node
)"""


def purchase_edges(orders: DataFrame, li: DataFrame) -> DataFrame:
    """Distinct directed (src=custkey, dst=suppkey+offset) long-id edges
    of the customer→supplier purchase graph."""
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + NODE_OFFSET).alias("dst"),
        )
        .distinct()
    )


def purchase_edges_weighted(orders: DataFrame, li: DataFrame) -> DataFrame:
    """(src=custkey, dst=suppkey+offset, wt=Σ l_quantity) long-id weighted
    edges of the customer→supplier purchase graph — ``purchase_edges``'s
    strength-carrying sibling (edge weight = transaction volume, what
    weighted PageRank ranks by, not mere adjacency).

    NULL keys and NULL quantities are filtered EXPLICITLY (and the oracle
    mirrors the predicate): a NULL key would otherwise ride the groupBy as
    its own node while never matching any join, and sum() skipping a NULL
    quantity inside an otherwise-NULL group would hand the operator a NULL
    weight, which it rejects by contract (operators/graph.py). l_quantity
    is integer-valued (TPC-H 1-50), so the per-pair double sums are EXACT
    in any summation order — the property that lets the unrolled oracle
    mirror wt/outw bit-for-bit."""
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .where(
            F.col("o_custkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + NODE_OFFSET).alias("dst"),
        )
        .agg(F.sum(F.col("l_quantity").cast("double")).alias("wt"))
    )


def node_label(node: str = "node") -> Column:
    """'c<custkey>' / 's<suppkey>' string label of a long node id —
    the inverse of ``purchase_edges``'s encoding, spelled identically
    to the oracles' ``'c' || custkey`` / ``'s' || suppkey``."""
    c = F.col(node)
    return F.when(
        c >= NODE_OFFSET,
        F.concat(F.lit("s"), (c - NODE_OFFSET).cast("string")),
    ).otherwise(F.concat(F.lit("c"), c.cast("string")))


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (u < v) part co-purchase pairs — the ONE
    definition of the graph that ``graph_triangle_count``
    (queries/fresh8f.py), ``graph_degree_distribution``
    (queries/fresh8j.py), and the scale probe's census
    (tools/scale_probe.py) all analyze: a basket-cap or dedup tweak
    applied to one consumer but not the others would make the censuses
    silently describe different graphs. Pair generation is quadratic
    only in basket size (bounded by the order-size cap the fixture
    inherits from TPC-H); unbounded baskets would take a basket-size
    cap exactly like the dedup family's stop-shingle DF cap."""
    li = (
        load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )


def copurchase_pairs_supported(
    spark: SparkSession, sf_dir: str, min_support: int = 2
) -> DataFrame:
    """Distinct undirected (u < v) part co-purchase pairs KEPT only when
    the pair co-occurs in ``min_support`` or more distinct orders — the
    support-thresholded sibling of ``copurchase_pairs``, defined here so
    the ``graph_k_core`` query and any probe census analyze the SAME
    graph (the drift class this module exists to prevent).

    Why a thresholded graph for k-core: the raw co-purchase graph is
    DENSE at fixture scale (minimum degree ~42 at sf0.01 — every node
    survives any small-k peel, so the core census would be the trivial
    identity). Support filtering is also the real-pipeline shape: an
    association graph keeps edges with evidence, and the k-core then
    prunes the weakly-connected residue. Same pair-generation cost as
    ``copurchase_pairs``; the HAVING rides the pair aggregate (one
    shuffle, same keys) instead of a distinct."""
    li = (
        load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
        .select("u", "v")
    )
