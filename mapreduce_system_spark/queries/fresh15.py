"""Round-16 registrations, second pair (the fresh13 same-round
precedent: operator staged, probed, THEN registered within one round —
both probes ran green BEFORE these registrations existed,
bench_runs/scale_probe_r16_ccjump.json / scale_probe_r16_fjoin.json):
two surfaces whose operator halves were staged earlier this round with
pytest-pinned parity and drafted oracles (tests/test_ccjump.py's
union-find reference + unrolled CTE + 20-topology fuzz,
tests/test_streaming.py's both-side-sentinel full-outer pin).
Registered PAST the r16 window (which VERDICT r15 #1's composition
consumes exactly), so they join the fresh14 pair in the r17 window's
lead slots for their first driver rows.

- ``graph_components_jump`` — pointer-jumping connected components
  over the customer ORDER-CHAIN graph: consecutive orders of a
  customer (by o_orderdate, o_orderkey) are linked, so each customer's
  order history is a PATH and the component census is the chain-length
  distribution. Constants chosen with data (the k-truss lesson,
  VERDICT r15 #2): the raw co-purchase graph is ONE component at both
  gate scales (the --ccjump probe's census: a single 20k-node blob —
  a census over it verifies almost nothing), while the order-chain
  graph is 1,498 components spanning sizes 2..25 at sf0.01; max chain
  25 nodes = diameter 24 at every fixture scale (sf0.001 max 18), so
  ``rounds=4`` (reach 2^5 - 2 = 30) is the minimal converging budget —
  and convergence is ASSERTED by the fixed-point pytest, not assumed.
  Node ids are SEQUENCE POSITIONS (o_custkey * 1024 + row_number - 1),
  not raw orderkeys — a registration-shaping finding: the alternating
  min+jump recurrence's reach bound (and the --ccjump probe's 10-round
  depth-2000 measurement) holds for ids MONOTONE along the chain, but
  with randomly-placed ids the jump loses its doubling (measured here:
  an 18-node random-orderkey chain was still unconverged at rounds=7 —
  the min sits mid-chain and lab(lab) re-lands on it instead of
  leaping). Canonicalizing to position ids puts the registered graph
  in the regime the bound and probe actually cover; callers with
  arbitrary ids must size rounds toward the min-label diameter bound
  or canonicalize the same way (see connected_components_jump's
  docstring). Paths are also the operator's honest regime: the probe
  measured 10 rounds at depth 2000 vs 14 at 10x that depth (the
  O(log d) claim), where min-label CC (operators/dedup.py) would need
  the diameter outright.
- ``stream_interval_join_full`` — the attribution matrix's last cell:
  clicks that never converted AND purchases no click can claim
  (inner r13 ``stream_interval_join_attrib`` -> left outer r14
  ``stream_interval_join_outer`` -> FULL OUTER). Batch twin of
  ``streaming.windows.interval_join(how='full_outer')``; the streaming
  form — unmatched rows on EACH side emitted once their own join
  window passes the (min-across-inputs) watermark — is asserted equal
  in tests/test_streaming.py with sentinels on both streams, and the
  --fjoin probe pinned the census exactly x10 with peak state rows
  x9.47 (the time-range predicate is the state bound).

Reference contrast: worker.go:104-165's one-shot map→reduce can link
consecutive orders (a sort + lag is one reduce), but the component
label needs the reflexive reduce-of-reduces the jump rounds express —
and the full-outer meet needs to PROVE a non-match on both sides
(coordinator.go:126-141's pipeline has no notion of "no partner ever
arrives"; the watermark is that proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators.graph import connected_components_jump
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table
from mapreduce_system_spark.streaming import windows as SW

# ---------------------------------------------------------------------------
# graph_components_jump — order-chain census via pointer-jumping CC
# ---------------------------------------------------------------------------

_CC_ROUNDS = 4  # reach 2^(r+1)-2 = 30 >= the fixture-wide max diameter 24


def _ccjump_round_cte(prev: str, cur: str, r: int) -> str:
    """One unrolled alternating round (tests/test_ccjump.py's draft
    verbatim): neighbor-min incl. self, then pointer jump. MATERIALIZED
    is load-bearing — DuckDB inlines CTEs per reference site, and m{r}
    / l{r} are each referenced twice, so the plain spelling re-expands
    4^rounds (the k-truss r16 lesson, queries/fresh14.py)."""
    return f"""m{r} AS MATERIALIZED (
  SELECT id, min(lab) AS lab FROM (
    SELECT id, lab FROM {prev}
    UNION ALL
    SELECT e.src AS id, l.lab FROM e0 e JOIN {prev} l ON l.id = e.dst
  ) GROUP BY id
), {cur} AS MATERIALIZED (
  SELECT a.id, b.lab FROM m{r} a JOIN m{r} b ON b.id = a.lab
)"""


_CC_SQL = (
    """
WITH rn_t AS (
  SELECT o_custkey, row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS rn
  FROM orders
),
ordered AS (
  -- id stride GUARD: position-canonical ids collide across customers if
  -- any customer has > 1024 orders; fail loudly instead of silently
  -- merging chains (same guard as the Spark side's assert_true)
  SELECT o_custkey * 1024 + rn - 1
         + CASE WHEN rn > 1024
                THEN error('orders-per-customer exceeds the 1024 id stride')
                ELSE 0 END AS id
  FROM rn_t
),
pr AS (
  SELECT id - 1 AS u, id AS v
  FROM ordered WHERE id % 1024 <> 0
),
e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM pr
                    UNION ALL SELECT v, u FROM pr),
l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lab FROM e0),
"""
    + ",\n".join(
        _ccjump_round_cte(f"l{r}", f"l{r + 1}", r) for r in range(_CC_ROUNDS)
    )
    + f""",
comp AS (
  SELECT lab, count(*) AS sz, sum(id) AS id_sum
  FROM l{_CC_ROUNDS} GROUP BY lab
)
SELECT sz,
       CAST(count(*) AS BIGINT) AS n_chains,
       CAST(sum(lab) AS BIGINT) AS sum_min_id,
       CAST(sum(id_sum) AS BIGINT) AS sum_member_ids
FROM comp
GROUP BY sz
ORDER BY sz
"""
)


@register("graph_components_jump", _CC_SQL)
def q_graph_components_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-length census of the customer order-chain graph, labeled
    by pointer-jumping CC (operators/graph.py::connected_components_jump,
    rounds=4 — converging by data, see the module docstring; node ids
    are position-canonical, monotone along each chain — the layout the
    reach bound is valid for). Output is the bounded census (one row
    per chain size, ~25 rows): n_chains pins the partition cardinality,
    sum_min_id pins WHICH customer anchors each component (the min id
    is o_custkey * 1024 by construction — any relink moves it),
    sum_member_ids pins the full membership multiset in aggregate —
    without shipping 15k node rows through the gate. Single-order
    customers have no edge and are absent by construction (a path needs
    two endpoints)."""
    orders = load_table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rn = F.row_number().over(w)
    # id stride GUARD: the position-canonical id o_custkey*1024 + rn - 1
    # silently collides across customers (merging adjacent customers'
    # chains AND breaking the id % 1024 first-order filter) if any
    # customer ever has > 1024 orders. assert_true rides the same
    # projection — no extra action, evaluated at any scale — and fails
    # the job loudly instead; the oracle carries the error() twin.
    guard = F.coalesce(
        F.assert_true(
            rn <= F.lit(1024),
            F.lit("orders-per-customer exceeds the 1024 id stride"),
        ).cast("long"),
        F.lit(0),
    )
    chain = (
        orders.select(
            (F.col("o_custkey") * 1024 + rn - 1 + guard).alias("id")
        )
        .where(F.col("id") % 1024 != 0)
        .select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
    )
    lab = connected_components_jump(chain, rounds=_CC_ROUNDS)
    comp = lab.groupBy("lab").agg(
        F.count("*").alias("sz"), F.sum("id").alias("id_sum")
    )
    return (
        comp.groupBy("sz")
        .agg(
            F.count("*").alias("n_chains"),
            F.sum("lab").alias("sum_min_id"),
            F.sum("id_sum").alias("sum_member_ids"),
        )
        .orderBy("sz")
    )


# ---------------------------------------------------------------------------
# stream_interval_join_full — two-sided unmatched attribution (FULL OUTER)
# ---------------------------------------------------------------------------

# The inner twin profiles attributed clicks, the left-outer twin adds
# never-converted clicks; this one also surfaces ORPHAN PURCHASES (no
# click within the window can claim them) — the audit row a revenue
# pipeline needs before it trusts its attribution totals. n_rows =
# n_matched + n_click_only + n_purchase_only by construction, and the
# value column splits into attributed (matched purchase rows) vs orphan.
_FULL_SQL = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT c.user_id AS c_user, c.ts AS c_ts,
              p.user_id AS p_user, p.ts AS p_ts, p.value
       FROM c FULL JOIN p ON c.user_id = p.user_id
                         AND p.ts >= c.ts
                         AND p.ts <= c.ts + INTERVAL '30 minutes'
     )
SELECT coalesce(c_user, p_user) AS user_id,
       count(*) AS n_rows,
       CAST(count(*) FILTER (WHERE c_ts IS NOT NULL AND p_ts IS NOT NULL)
            AS BIGINT) AS n_matched,
       CAST(count(*) FILTER (WHERE c_ts IS NOT NULL AND p_ts IS NULL)
            AS BIGINT) AS n_click_only,
       CAST(count(*) FILTER (WHERE c_ts IS NULL) AS BIGINT) AS n_purchase_only,
       round(coalesce(sum(value) FILTER (WHERE c_ts IS NOT NULL), 0.0), 2)
         AS attributed_value,
       round(coalesce(sum(value) FILTER (WHERE c_ts IS NULL), 0.0), 2)
         AS orphan_value
FROM j
GROUP BY coalesce(c_user, p_user)
ORDER BY user_id
"""


@register("stream_interval_join_full", _FULL_SQL)
def q_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the FULL OUTER stream-stream interval join
    (streaming.windows.interval_join(how='full_outer'), staged r16):
    every click keeps its purchases within 30 minutes; clicks with none
    emit once with NULL right columns, purchases no click claims emit
    once with NULL left columns. NULL-user rows from BOTH sides land in
    one NULL group via coalesce (equality never matches them; both
    engines group NULL together). The value column splits exactly:
    attributed_value sums purchases on matched rows, orphan_value sums
    the click-less purchases — together they reconcile to the purchase
    total, which is the audit this query exists to ship."""
    ev = load_table(
        spark, sf_dir, "events", columns=["ts", "user_id", "event_type", "value"]
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = SW.interval_join(
        clicks, purchases, on="user_id", max_delay="30 minutes", how="full_outer"
    )
    matched = F.col("l_ts").isNotNull() & F.col("r_ts").isNotNull()
    return (
        joined.groupBy(
            F.coalesce("l_user_id", "r_user_id").alias("user_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(matched).alias("n_matched"),
            F.count_if(
                F.col("l_ts").isNotNull() & F.col("r_ts").isNull()
            ).alias("n_click_only"),
            F.count_if(F.col("l_ts").isNull()).alias("n_purchase_only"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("l_ts").isNotNull(), F.col("r_value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("attributed_value"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("l_ts").isNull(), F.col("r_value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("orphan_value"),
        )
        .orderBy("user_id")
    )
