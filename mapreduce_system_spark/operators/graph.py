"""PageRank — the second iterative-algorithm surface (next to k-means).

The reference's one-shot map→reduce pipeline (coordinator.go:126-141)
cannot express iteration at all; the original MapReduce paper's own
flagship follow-up workload (link analysis) needed a driver loop around
the framework. Here the loop is a DataFrame recurrence with the same
scale discipline as ``operators/dedup.py::connected_components``:

- per-iteration work is ONE equi-join (ranks onto the contribution
  edge list) + ONE aggregation — partial+final, map-side combinable;
- the contribution edge list (edge + 1/outdeg weight) is computed once
  and cached; iterations never re-derive the graph;
- each round ``localCheckpoint``s its rank vector and releases the
  previous round's blocks (``caches.unpersist_rdd_ids``), so lineage
  and storage stay O(1) in the iteration count;
- the only driver-side values are the node count N (one scalar) and
  the loop bound — rank vectors never leave the cluster.

Float discipline for oracle parity: contributions are
``rank * (1.0 / outdeg)`` (multiply by reciprocal, NOT a division per
edge) and the teleport term is ``0.15 / N`` with the literal 0.15 —
the DuckDB twin spells the identical expressions, so the doubles agree
bit-for-bit modulo summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import (
    persistent_rdd_ids,
    track_rdd_ids,
    tracked_cache,
    unpersist_rdd_ids,
)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Rank nodes of the directed edge list by PageRank.

    ``edges`` should be deduplicated by the caller (duplicate edges act
    as weights). Every node must have at least one out-edge (feed an
    undirected graph as two directed edges to guarantee it — dangling
    mass redistribution is deliberately out of scope so the recurrence
    matches the unrolled SQL oracle exactly). Returns (node, rank).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = e.groupBy("u").agg(F.count("*").cast("double").alias("outdeg"))
    # contribution edge list: (u, v, 1/outdeg) — the loop's only input
    ce = tracked_cache(
        e.join(deg, "u").select("u", "v", (F.lit(1.0) / F.col("outdeg")).alias("w"))
    )
    nodes = tracked_cache(
        e.select(F.col("u").alias("node")).union(e.select(F.col("v").alias("node"))).distinct()
    )
    n = nodes.count()  # bounded driver scalar (node count)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = 0.15 / n if damping == 0.85 else (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev_ids: set[int] = set()
    for _ in range(iterations):
        contribs = (
            ce.join(ranks, ce.u == ranks.node)
            .select(F.col("v").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        before = persistent_rdd_ids(spark)
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        step_ids = persistent_rdd_ids(spark) - before
        if prev_ids:
            unpersist_rdd_ids(spark, prev_ids)
        prev_ids = step_ids
    if prev_ids:
        track_rdd_ids(spark, prev_ids)
    return ranks
