"""Round-7 addition (third batch): PageRank over the purchase graph.

``graph_pagerank`` ranks the undirected customer—supplier graph
(an edge per distinct (o_custkey, l_suppkey) purchase relationship,
fed to the operator as two directed edges so no node dangles) with 3
damped iterations. The oracle UNROLLS the recurrence into chained
CTEs — r0 → r1 → r2 → r3 — with expressions spelled identically to
the Spark side (multiply-by-reciprocal contributions, 0.15/N teleport,
doubles throughout), so the driver's value-hash check covers the whole
iterative computation, not just a rows-only count (the same posture as
k-means' exported-centroid oracle, queries/similarity.py).

See ``operators/graph.py`` for the scale discipline (per-round
checkpoint + block release, O(1) driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.queries._graphshared import (
    node_label,
    pagerank_iter_cte,
    purchase_edges,
)
from mapreduce_system_spark.operators.graph import pagerank
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_ITERATIONS = 3


_PAGERANK_SQL = (
    """
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
ud AS (SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst AS u, src AS v FROM e),
deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS outdeg FROM ud GROUP BY 1),
ce AS (SELECT ud.u, ud.v, CAST(1.0 AS DOUBLE) / deg.outdeg AS w
       FROM ud JOIN deg ON deg.u = ud.u),
nodes AS (SELECT DISTINCT u AS node FROM ud),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn),
"""
    + ",\n".join(pagerank_iter_cte(f"r{i}", f"r{i + 1}") for i in range(_ITERATIONS))
    + f"""
SELECT node, round(rank * 1000000, 4) AS rank_ppm
FROM r{_ITERATIONS}
ORDER BY node
"""
)


@register("graph_pagerank", _PAGERANK_SQL)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank of the undirected customer—supplier purchase
    graph, reported in ppm. High-rank nodes are the suppliers whose
    customer fan-in is largest — the link-analysis workload the original
    MapReduce paper motivated but the reference cannot iterate."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    # Long-id iteration + final string labels: the shared codec in
    # queries/_graphshared.py (one definition for both PageRank queries).
    # The pair set is cached because the union references it twice and
    # the operator derives outdegrees, contribution edges, AND the node
    # set from it — uncached, the fact-fact join + distinct subtree
    # re-runs ~4x.
    e = tracked_cache(purchase_edges(orders, li))
    ud = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(ud, iterations=_ITERATIONS, damping=0.85)
    return ranks.select(
        node_label().alias("node"), F.round(F.col("rank") * 1000000, 4).alias("rank_ppm")
    ).orderBy("node")
