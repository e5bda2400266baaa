"""Association-rules operator (operators/basket.py) — staged r11 for the
r13 debut; the registered query will spell exactly this oracle algebra
(the weighted-pagerank / pca_topk staging pattern, r10/r11)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.basket import association_rules

_BASKETS = [
    (1, "bread"), (1, "butter"), (1, "milk"),
    (2, "bread"), (2, "butter"),
    (3, "bread"), (3, "milk"),
    (4, "butter"), (4, "milk"),
    (5, "bread"), (5, "bread"),          # duplicate membership = one
    (6, "tea"),                          # singleton basket: no pairs
    (7, None), (None, "ghost"),          # NULL keys drop
]


def _spark_rules(spark, min_pair_count=1):
    df = spark.createDataFrame(_BASKETS, "basket int, item string")
    return association_rules(df, min_pair_count=min_pair_count)


def test_association_rules_match_unrolled_duckdb(spark, tmp_path):
    """Cross-engine parity, drafted as the future registered query's
    oracle will spell it: distinct membership, within-basket self-join
    (u < v), both directions, metrics as single divisions of exact
    integer counts (no summation-order freedom at all)."""
    spark.createDataFrame(_BASKETS, "basket int, item string").write.parquet(
        f"{tmp_path}/baskets.parquet"
    )
    got = {
        (r.antecedent, r.consequent): (
            r.pair_count, r.ante_count, r.cons_count, r.n_baskets,
            r.support, r.confidence, r.lift,
        )
        for r in _spark_rules(spark, min_pair_count=2).collect()
    }
    sql = f"""
WITH b AS (
  SELECT DISTINCT basket AS bk, item AS it
  FROM read_parquet('{tmp_path}/baskets.parquet/*.parquet')
  WHERE basket IS NOT NULL AND item IS NOT NULL
),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
ic AS (SELECT it AS item, CAST(count(*) AS BIGINT) AS item_count FROM b GROUP BY 1),
pairs AS (
  SELECT a.it AS u, c.it AS v, CAST(count(*) AS BIGINT) AS pair_count
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2
  HAVING count(*) >= 2
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
"""
    want = {(a, c): rest for a, c, *rest in duckdb.sql(sql).fetchall()}
    want = {k: tuple(v) for k, v in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_association_rules_invariants(spark):
    """lift is symmetric per unordered pair; confidence <= 1; support
    consistent with the marginals; duplicate memberships and NULL keys
    are gone; singleton baskets produce no rules."""
    rows = _spark_rules(spark).collect()
    by_dir = {(r.antecedent, r.consequent): r for r in rows}
    assert by_dir  # non-empty
    for (a, c), r in by_dir.items():
        assert r.confidence <= 1.0 + 1e-12
        mirror = by_dir[(c, a)]
        assert r.lift == mirror.lift  # exact: same three integers
        assert r.pair_count == mirror.pair_count
        assert "ghost" not in (a, c)
        assert a != "tea" and c != "tea"
    # bread & butter co-occur in baskets 1,2 of 6 valid baskets
    bb = by_dir[("bread", "butter")]
    assert (bb.pair_count, bb.n_baskets) == (2, 6)
    assert bb.support == 2 / 6
    assert bb.confidence == 2 / 4  # bread appears in baskets 1,2,3,5


def test_association_rules_min_pair_count_validates():
    with pytest.raises(ValueError, match="min_pair_count"):
        association_rules(None, min_pair_count=0)


def test_association_rules_plan_broadcasts_marginals(spark):
    """The item-count and basket-total relations must come in as
    broadcasts — a shuffled join of dimension-sized marginals onto the
    pair set would be plan waste at any scale."""
    from mapreduce_system_spark.plans.checks import formatted_plan

    df = _spark_rules(spark)
    plan = formatted_plan(df)
    assert plan.count("BroadcastExchange") >= 2, plan
