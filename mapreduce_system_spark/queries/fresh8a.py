"""Round-8 additions (first batch): PageRank with dangling-mass handling.

``graph_pagerank_dangling`` runs the DIRECTED customer→supplier purchase
graph — suppliers have no out-edges, so every supplier is a dangling
node and the leaky recurrence of ``graph_pagerank`` would lose ~all
probability mass within a few rounds. The operator's ``redistribute``
mode (operators/graph.py) adds the standard correction: each round the
mass sitting on out-degree-0 nodes is shared uniformly,
``rank = base + d * (contrib + m/N)``, with the per-round dangling mass
``m`` computed as a one-row aggregate broadcast back into the update —
no driver-side state.

The oracle unrolls the corrected recurrence into chained CTEs exactly
like ``queries/fresh7d.py`` does for the leak-free variant, with one
extra one-row CTE per round (``m0``, ``m1``, …) spelling the identical
``coalesce(sum(rank), 0.0)`` over the dangling node set and the
identical ``m / n`` division — so the driver's value hash covers the
dangling term itself, not just the converged shape.

Reference contrast: the reference's one-shot map→reduce (coordinator.
go:126-141) cannot iterate at all; see operators/graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.queries._graphshared import node_label, purchase_edges
from mapreduce_system_spark.operators.graph import pagerank
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.merge import merge_upsert, read_latest
from mapreduce_system_spark.sources.tables import load_table

_ITERATIONS = 3


def _iter_cte(prev: str, cur: str, m: str) -> str:
    """One unrolled dangling-corrected PageRank iteration (formula
    mirrors operators/graph.py's redistribute branch exactly)."""
    return f"""{m} AS (
  SELECT coalesce(sum({prev}.rank), CAST(0.0 AS DOUBLE)) AS m
  FROM {prev} JOIN dang USING (node)
),
{cur} AS (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE) / nn.n
           + CAST(0.85 AS DOUBLE) * (coalesce(s.contrib, CAST(0.0 AS DOUBLE)) + mm.m / nn.n) AS rank
  FROM nodes CROSS JOIN nn CROSS JOIN {m} mm
  LEFT JOIN (
    SELECT ce.v AS node, sum({prev}.rank * ce.w) AS contrib
    FROM ce JOIN {prev} ON {prev}.node = ce.u
    GROUP BY 1
  ) s ON s.node = nodes.node
)"""


_PAGERANK_DANGLING_SQL = (
    """
WITH e AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
deg AS (SELECT src AS u, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
ce AS (SELECT e.src AS u, e.dst AS v, CAST(1.0 AS DOUBLE) / deg.outdeg AS w
       FROM e JOIN deg ON deg.u = e.src),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
-- NOT EXISTS, not NOT IN: with a NULL o_custkey the deg subquery
-- contains a NULL u, and `node NOT IN (...NULL...)` is never TRUE —
-- DuckDB's dang set goes EMPTY and the whole redistribution silently
-- dies (found by the r11 adversarial gate). NOT EXISTS mirrors the
-- operator's left_anti exactly: the NULL-labeled node counts as
-- dangling (its out-edges can never deliver through an equi-join),
-- while the m CTE's equality join below excludes its rank from the
-- redistributed mass — also exactly the operator's left_semi.
dang AS (SELECT node FROM nodes n0
         WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.u = n0.node)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn),
"""
    + ",\n".join(_iter_cte(f"r{i}", f"r{i + 1}", f"m{i}") for i in range(_ITERATIONS))
    + f"""
SELECT node, round(rank * 1000000, 4) AS rank_ppm
FROM r{_ITERATIONS}
ORDER BY node
"""
)


@register("graph_pagerank_dangling", _PAGERANK_DANGLING_SQL)
def q_graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank of the DIRECTED customer→supplier graph with
    dangling-mass redistribution, in ppm. Every supplier dangles (no
    out-edges), so this exercises the correction term end-to-end:
    without it the reported mass would collapse toward the teleport
    floor; with it the ppm column sums to ~1,000,000."""
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = load_table(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    # Long node ids via the shared codec (queries/_graphshared.py) —
    # only the final result maps to string labels.
    e = tracked_cache(purchase_edges(orders, li))
    ranks = pagerank(e, iterations=_ITERATIONS, damping=0.85, dangling="redistribute")
    return ranks.select(
        node_label().alias("node"), F.round(F.col("rank") * 1000000, 4).alias("rank_ppm")
    ).orderBy("node")


# ---------------------------------------------------------------------------
# sink_merge_upsert — MERGE-style keyed compaction write path
# ---------------------------------------------------------------------------

# The oracle is rel_cdc_latest_state's algebra verbatim (kept literal —
# importing fresh7c at module scope would register its queries here and
# shift the correctness window): folding the changelog through the
# upsert sink in ANY batch order must land on the same latest-state view
# a single-pass compaction computes.
_MERGE_SQL = """
SELECT user_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
       event_type AS last_type,
       round(value, 2) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@register("sink_merge_upsert", _MERGE_SQL)
def q_sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MERGE/upsert write path (VERDICT r7 #6): the events
    changelog is split into three batches (pmod(hash(event_id), 3) — the
    split is arbitrary and the result must not depend on it), each folded
    into a bucket-partitioned keyed sink via ``sources/merge.py``; the
    returned view is the sink's latest state, which must hash-match the
    one-pass CDC compaction oracle.

    Scale shape: each merge reads back only the bucket partitions the
    batch touches and rewrites only those (dynamic partition overwrite);
    recovery is idempotent replay (tests/test_merge_sink.py)."""
    from mapreduce_system_spark.queries.sinks import _staging_path

    ev = load_table(
        spark, sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    root = _staging_path("merge_upsert", sf_dir, spark)
    for i in range(3):
        batch = ev.where(F.pmod(F.hash("event_id"), F.lit(3)) == i)
        merge_upsert(
            spark, root, batch,
            key_cols=["user_id"], order_cols=["ts", "event_id"],
        )
    back = read_latest(spark, root)
    return back.select(
        "user_id",
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_type").alias("last_type"),
        F.round("value", 2).alias("last_value"),
    ).orderBy("user_id")
