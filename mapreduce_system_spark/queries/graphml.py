"""Round-11 debuts (staged in r10, wired this round — VERDICT r10 #2).

Two iterative-algebra surfaces whose OPERATOR halves landed with
pytest-pinned unrolled-recurrence parity in r10:

- ``graph_pagerank_weighted`` — PageRank over the customer—supplier
  purchase graph with edge strength = transaction volume (Σ l_quantity
  per relationship) instead of mere adjacency: contributions are
  ``rank · wt/Σ out-weight`` (operators/graph.py ``weight=`` mode).
  The oracle unrolls all 3 damped iterations into chained CTEs with
  expressions spelled identically to the Spark side — deg = sum(wt),
  share = wt/outw, teleport 0.15/N — so the driver's value hash covers
  the whole weighted computation (the ``graph_pagerank`` pattern,
  queries/fresh7d.py). l_quantity is integer-valued, so every per-pair
  and per-node weight sum is EXACT in any summation order and the
  share doubles are bit-identical cross-engine; only the rank sums
  carry summation-order ulps, absorbed by the ppm rounding.
- ``emb_pca_topk_deflation`` — the top-2 principal directions of the
  embedding corpus by power iteration with orthogonal deflation
  (operators/pca.py): component 0 is ``emb_pca_power_iteration``'s
  plain recurrence; component 1 starts from the deflated uniform
  vector and re-deflates every loading iterate. The oracle unrolls
  both components × both rounds (26 CTEs) with expression-identical
  doubles — the start constant is ``1/sqrt(d)`` computed FROM THE
  DATA on both engines (sqrt is IEEE correctly-rounded in CPython and
  DuckDB alike), so the oracle holds at any dimensionality, not just
  the fixture's d=64.

Scale posture (both inherit their operators' audits): PageRank touches
the edge relation once per round through a partial+final aggregate with
the rank vector AQE-broadcast, per-round localCheckpoint + block release
(the bucketed alternative was A/B'd WORSE in r10 — operators/graph.py);
PCA touches the exploded corpus 2·k·rounds times with every deflation
object k·d or smaller and nothing but the dimensionality on the driver.

Reference contrast: the reference engine is one-shot map→reduce
(coordinator.go:126-141) — it cannot iterate, carry per-round broadcast
state, or express vector algebra (KeyValue is string/string,
worker.go:26-29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.operators.graph import pagerank
from mapreduce_system_spark.operators.pca import pca_topk
from mapreduce_system_spark.queries._graphshared import (
    node_label,
    pagerank_iter_cte,
    purchase_edges_weighted,
)
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_ITERATIONS = 3


_PAGERANK_WEIGHTED_SQL = (
    """
WITH e AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         's' || CAST(l_suppkey AS VARCHAR) AS dst,
         sum(CAST(l_quantity AS DOUBLE)) AS wt
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
ud AS (SELECT src AS u, dst AS v, wt FROM e
       UNION ALL SELECT dst AS u, src AS v, wt FROM e),
deg AS (SELECT u, sum(wt) AS outw FROM ud GROUP BY 1),
ce AS (SELECT ud.u, ud.v, ud.wt / deg.outw AS w
       FROM ud JOIN deg ON deg.u = ud.u),
nodes AS (SELECT DISTINCT u AS node
          FROM (SELECT u FROM ud UNION ALL SELECT v AS u FROM ud)),
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


@register("graph_pagerank_weighted", _PAGERANK_WEIGHTED_SQL)
def q_graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration volume-weighted PageRank of the undirected
    customer—supplier purchase graph, in ppm: a supplier moving many
    units to few customers now outranks one moving few units to many —
    the strength-aware ranking ``graph_pagerank``'s adjacency-only form
    cannot express."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = load_table(
        spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_quantity"]
    )
    # cached for the same reason as graph_pagerank's pair set: the union
    # references it twice and the operator derives out-weights, shares,
    # the node set, AND the weight-validity scalar from the union —
    # uncached, the fact-fact aggregate subtree re-runs ~5x
    e = tracked_cache(purchase_edges_weighted(orders, li))
    ud = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "wt")
    )
    ranks = pagerank(ud, weight="wt", iterations=_ITERATIONS, damping=0.85)
    return ranks.select(
        node_label().alias("node"),
        F.round(F.col("rank") * 1000000, 4).alias("rank_ppm"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# emb_pca_topk_deflation — top-2 principal directions, matrix-free
# ---------------------------------------------------------------------------

# The unrolled twin of pca_topk(k=2, rounds=2) — component 0 (v1) is the
# plain power iteration from the uniform 1/sqrt(d) start; component 1 (v2)
# deflates the start against v1 (b_t0) and re-deflates each loading iterate
# (b_p1, b_p2). Every CTE mirrors one Spark aggregate with the SAME operand
# order; d comes from the data so the oracle holds on any corpus.
_PCA_TOPK_SQL = """
WITH comp AS (
  SELECT vec_id AS id,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
dd AS (SELECT CAST(max(pos) + 1 AS DOUBLE) AS d FROM comp),
st AS (SELECT 1.0 / sqrt(d) AS v0 FROM dd),
a_s1 AS (SELECT id, sum(val * st.v0) AS s FROM comp CROSS JOIN st GROUP BY id),
a_w1 AS (SELECT c.pos, sum(c.val * a_s1.s) AS w
         FROM comp c JOIN a_s1 USING (id) GROUP BY c.pos),
a_n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM a_w1),
a_v1 AS (SELECT pos, w / nullif(nrm, 0) AS v FROM a_w1 CROSS JOIN a_n1),
a_s2 AS (SELECT c.id, sum(c.val * a_v1.v) AS s
         FROM comp c JOIN a_v1 USING (pos) GROUP BY c.id),
a_w2 AS (SELECT c.pos, sum(c.val * a_s2.s) AS w
         FROM comp c JOIN a_s2 USING (id) GROUP BY c.pos),
a_n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM a_w2),
v1 AS (SELECT pos, w / nullif(nrm, 0) AS v FROM a_w2 CROSS JOIN a_n2),
b_d0 AS (SELECT sum(st.v0 * v1.v) AS dot FROM v1 CROSS JOIN st),
b_t0 AS (SELECT v1.pos, st.v0 - b_d0.dot * v1.v AS v
         FROM v1 CROSS JOIN st CROSS JOIN b_d0),
b_s1 AS (SELECT c.id, sum(c.val * b_t0.v) AS s
         FROM comp c JOIN b_t0 USING (pos) GROUP BY c.id),
b_w1 AS (SELECT c.pos, sum(c.val * b_s1.s) AS w
         FROM comp c JOIN b_s1 USING (id) GROUP BY c.pos),
b_d1 AS (SELECT sum(b_w1.w * v1.v) AS dot FROM b_w1 JOIN v1 USING (pos)),
b_p1 AS (SELECT b_w1.pos, b_w1.w - b_d1.dot * v1.v AS w
         FROM b_w1 JOIN v1 USING (pos) CROSS JOIN b_d1),
b_n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM b_p1),
b_v1 AS (SELECT pos, w / nullif(nrm, 0) AS v FROM b_p1 CROSS JOIN b_n1),
b_s2 AS (SELECT c.id, sum(c.val * b_v1.v) AS s
         FROM comp c JOIN b_v1 USING (pos) GROUP BY c.id),
b_w2 AS (SELECT c.pos, sum(c.val * b_s2.s) AS w
         FROM comp c JOIN b_s2 USING (id) GROUP BY c.pos),
b_d2 AS (SELECT sum(b_w2.w * v1.v) AS dot FROM b_w2 JOIN v1 USING (pos)),
b_p2 AS (SELECT b_w2.pos, b_w2.w - b_d2.dot * v1.v AS w
         FROM b_w2 JOIN v1 USING (pos) CROSS JOIN b_d2),
b_n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM b_p2),
-- spectrum-exhaustion guard, mirroring operators/pca.py: when k exceeds
-- the corpus's effective rank the deflated iterate is zero in exact
-- arithmetic and the computed norm is pure round-off; normalizing that
-- amplifies engine-specific ulps into DIFFERENT garbage directions per
-- engine (r11 embeddings fuzz, rank-1 corpus). Both engines' ~eps norms
-- fall far below 1e-9 of component 0's, so the CASE agrees.
v2 AS (SELECT pos,
              CASE WHEN b_n2.nrm >= 1e-9 * a_n2.nrm
                   THEN w / nullif(b_n2.nrm, 0) END AS v
       FROM b_p2 CROSS JOIN b_n2 CROSS JOIN a_n2)
SELECT 0 AS component, pos, round(v, 6) AS loading FROM v1
UNION ALL
SELECT 1 AS component, pos, round(v, 6) AS loading FROM v2
ORDER BY component, pos
"""


@register("emb_pca_topk_deflation", _PCA_TOPK_SQL)
def q_pca_topk_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal directions of the (uncentered) embedding corpus by
    matrix-free power iteration with orthogonal deflation — the spectrum
    audit behind whitening and PQ subspace allocation, extending
    ``emb_pca_power_iteration``'s single direction without ever forming
    the Gram matrix. Directions come out unit-norm and mutually
    orthogonal (pytest-pinned invariants on random corpora); loadings
    round at 6 with summation-order noise ~3 orders below the grid."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = pca_topk(emb, k=2, rounds=2)
    return out.select(
        "component", "pos", F.round("loading", 6).alias("loading")
    ).orderBy("component", "pos")
