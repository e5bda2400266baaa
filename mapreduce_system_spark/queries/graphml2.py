"""Round-12 registrations (staged in r11, wired this round — VERDICT r11 #3).

Two surfaces whose OPERATOR halves landed in r11 with pytest-pinned
cross-engine parity; registering them now (past the r12 window, which is
exactly consumed by rotation debt) gives them the r13 window's lead
slots for their first driver rows — the stage-in-N, wire-in-N+1 pattern
that produced first-try driver greens for ``graph_pagerank_weighted``
and ``emb_pca_topk_deflation``:

- ``graph_pagerank_personalized`` — random walk with restart on the
  DIRECTED customer→supplier purchase graph, seeded on the BUILDING
  market segment (operators/graph.py ``seeds=`` mode). Every supplier
  dangles, so the query exercises the SEEDED restart end-to-end:
  dangling mass returns to the seed set (``m·tp``), not uniformly — the
  "which suppliers matter to THIS customer cohort" ranking that uniform
  PageRank cannot express. The oracle unrolls the seeded recurrence
  ``0.15·tp + 0.85·(contrib + m·tp)`` with tp = 1/|S∩nodes| on seeds
  else 0, r0 = tp, dang via NOT EXISTS (never NOT IN — the NULL-custkey
  lesson, queries/fresh8a.py), spelled double-for-double against
  operators/graph.py's seeded branch.
- ``basket_association_rules`` — directed support/confidence/lift rules
  over part co-purchase baskets (operators/basket.py): every unordered
  part pair co-occurring in ≥ 2 orders emits both directions with
  metrics as SINGLE divisions of exact integer counts, so the doubles
  are bit-identical cross-engine with no rounding at all (pinned in
  tests/test_basket.py) — the co-occurrence analytics one join deeper
  than ``mr_posting_pairs``'s pair counts.

Scale posture: personalized PageRank inherits pagerank's audit (per-round
partial+final aggregate, AQE-broadcast rank vector, localCheckpoint +
block release; the teleport column rides the node list the update join
already pays for). Association rules' only corpus-sized work is one
distinct + one within-basket self-join quadratic ONLY in basket size
(TPC-H order-size-capped; an unbounded corpus takes a basket-size cap,
operators/basket.py); the marginals broadcast is bounded by the ITEM
dimension — parts here — not the corpus (the documented item-cardinality
bound).

Reference contrast: the reference's one-shot map→reduce (coordinator.go:
126-141) can count pairs but cannot iterate a rank vector or join two
marginal relations back onto each pair (worker.go:104-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.operators.basket import association_rules
from mapreduce_system_spark.operators.graph import pagerank
from mapreduce_system_spark.queries._graphshared import node_label, purchase_edges
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_ITERATIONS = 3
_SEED_SEGMENT = "BUILDING"
_MIN_PAIR_COUNT = 2


def _seeded_iter_cte(prev: str, cur: str, m: str) -> str:
    """One unrolled seeded-restart PageRank iteration (formula mirrors
    operators/graph.py's seeds+redistribute branch exactly: the dangling
    mass multiplies the PER-NODE teleport, not 1/N)."""
    return f"""{m} AS (
  SELECT coalesce(sum({prev}.rank), CAST(0.0 AS DOUBLE)) AS m
  FROM {prev} JOIN dang USING (node)
),
{cur} AS (
  SELECT tp.node,
         CAST(0.15 AS DOUBLE) * tp.tp
           + CAST(0.85 AS DOUBLE) * (coalesce(s.contrib, CAST(0.0 AS DOUBLE)) + mm.m * tp.tp) AS rank
  FROM tp CROSS JOIN {m} mm
  LEFT JOIN (
    SELECT ce.v AS node, sum({prev}.rank * ce.w) AS contrib
    FROM ce JOIN {prev} ON {prev}.node = ce.u
    GROUP BY 1
  ) s ON s.node = tp.node
)"""


_PAGERANK_PERSONALIZED_SQL = (
    f"""
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
deg AS (SELECT src AS u, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
ce AS (SELECT e.src AS u, e.dst AS v, CAST(1.0 AS DOUBLE) / deg.outdeg AS w
       FROM e JOIN deg ON deg.u = e.src),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
-- NOT EXISTS, not NOT IN: a NULL o_custkey puts a NULL u in deg and
-- `node NOT IN (...NULL...)` is never TRUE (queries/fresh8a.py)
dang AS (SELECT node FROM nodes n0
         WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.u = n0.node)),
-- effective seeds = segment customers ∩ graph nodes, mirroring the
-- operator's left_semi (a seed without purchases carries no walk)
sset AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
         FROM customer WHERE c_mktsegment = '{_SEED_SEGMENT}'),
eff AS (SELECT s.node FROM sset s JOIN nodes USING (node)),
nsn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM eff),
tp AS (SELECT n.node, coalesce(s.t, CAST(0.0 AS DOUBLE)) AS tp
       FROM nodes n
       LEFT JOIN (SELECT node, 1.0 / nsn.ns AS t FROM eff CROSS JOIN nsn) s
         USING (node)),
r0 AS (SELECT node, tp AS rank FROM tp),
"""
    + ",\n".join(
        _seeded_iter_cte(f"r{i}", f"r{i + 1}", f"m{i}") for i in range(_ITERATIONS)
    )
    + f"""
SELECT node, round(rank * 1000000, 4) AS rank_ppm
FROM r{_ITERATIONS}
ORDER BY node
"""
)


@register("graph_pagerank_personalized", _PAGERANK_PERSONALIZED_SQL)
def q_graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration personalized PageRank (random walk with restart) of
    the directed customer→supplier graph, seeded on the BUILDING
    segment, in ppm: suppliers rank by their reachability FROM the
    cohort, non-seed customers hold exactly 0 (no in-edges, no
    teleport), and every supplier's dangling mass restarts at the seeds."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    seeds = cust.where(F.col("c_mktsegment") == _SEED_SEGMENT).select(
        F.col("c_custkey").cast("long").alias("node")
    )
    # cached for the same reason as graph_pagerank_dangling's edge set:
    # the operator derives outdegrees, contribution edges, the node set,
    # AND the seed semi-join from it — uncached, the fact-fact join +
    # distinct subtree re-runs ~5x
    e = tracked_cache(purchase_edges(orders, li))
    ranks = pagerank(
        e, iterations=_ITERATIONS, damping=0.85, dangling="redistribute", seeds=seeds
    )
    return ranks.select(
        node_label().alias("node"),
        F.round(F.col("rank") * 1000000, 4).alias("rank_ppm"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# basket_association_rules — support / confidence / lift over co-purchases
# ---------------------------------------------------------------------------

# The oracle spells operators/basket.py's algebra relation-for-relation:
# distinct membership, within-basket self-join (u < v), both directions,
# metrics as single divisions of exact BIGINT counts — bit-identical
# doubles cross-engine, no rounding (tests/test_basket.py pins this).
_ASSOCIATION_RULES_SQL = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
ic AS (SELECT it AS item, CAST(count(*) AS BIGINT) AS item_count FROM b GROUP BY 1),
pairs AS (
  SELECT a.it AS u, c.it AS v, CAST(count(*) AS BIGINT) AS pair_count
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2
  HAVING count(*) >= {_MIN_PAIR_COUNT}
),
directed AS (
  SELECT u AS antecedent, v AS consequent, pair_count FROM pairs
  UNION ALL
  SELECT v AS antecedent, u AS consequent, pair_count FROM pairs
)
SELECT d.antecedent, d.consequent, d.pair_count,
       ia.item_count AS ante_count, ic2.item_count AS cons_count,
       nb.n_baskets,
       CAST(d.pair_count AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
       CAST(d.pair_count AS DOUBLE) / CAST(ia.item_count AS DOUBLE) AS confidence,
       (CAST(d.pair_count AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE))
         / (CAST(ia.item_count AS DOUBLE) * CAST(ic2.item_count AS DOUBLE)) AS lift
FROM directed d
JOIN ic ia ON ia.item = d.antecedent
JOIN ic ic2 ON ic2.item = d.consequent
CROSS JOIN nb
ORDER BY antecedent, consequent
"""


@register("basket_association_rules", _ASSOCIATION_RULES_SQL)
def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over part co-purchase baskets (basket =
    order): for every part pair co-occurring in ≥ 2 orders, both
    directions with support, confidence, and lift — the rule-mining tail
    of the co-purchase family (``graph_triangle_count`` censuses the same
    graph's shape; this query quantifies each edge's association
    strength)."""
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    rules = association_rules(
        li, basket_col="l_orderkey", item_col="l_partkey",
        min_pair_count=_MIN_PAIR_COUNT,
    )
    return rules.orderBy("antecedent", "consequent")
