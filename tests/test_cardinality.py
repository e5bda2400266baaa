"""Join-cardinality estimation (operators/cardinality.py) — staged r12
for the r13 debut; the registered query will spell exactly this oracle
algebra (the weighted-pagerank / basket staging pattern, r10/r11/r12)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.cardinality import (
    join_cardinality_estimate,
    join_cardinality_exact,
)

# skewed left (custkey 1 is hot), NULL keys on both sides, right keys
# with no left match and vice versa
_LEFT = [(1,)] * 9 + [(2,)] * 3 + [(3,)] * 2 + [(5,)] + [(None,)] * 2
_RIGHT = [(1,)] * 4 + [(2,)] * 2 + [(4,)] * 3 + [(None,)]


def _frames(spark):
    l = spark.createDataFrame(_LEFT, "o_custkey long")
    r = spark.createDataFrame(_RIGHT, "c_custkey long")
    return l, r


def test_exact_cardinality_equals_materialized_join(spark):
    """Σ cA(k)·cB(k) over the count relations == count of the actual
    join — on a corpus with skew, NULLs, and unmatched keys on both
    sides (9·4 + 3·2 = 42; NULL keys never join)."""
    l, r = _frames(spark)
    got = join_cardinality_exact(l, r, "o_custkey", "c_custkey").collect()[0][0]
    real = l.join(r, l.o_custkey == r.c_custkey).count()
    assert got == real == 42


def test_exact_cardinality_zero_on_disjoint_and_empty(spark):
    l = spark.createDataFrame([(1,), (2,)], "o_custkey long")
    r = spark.createDataFrame([(3,)], "c_custkey long")
    assert join_cardinality_exact(l, r, "o_custkey", "c_custkey").collect()[0][0] == 0
    empty = spark.createDataFrame([], "c_custkey long")
    assert join_cardinality_exact(l, empty, "o_custkey", "c_custkey").collect()[0][0] == 0


def test_estimate_is_exact_at_full_sample_and_deterministic(spark):
    """sample_pct=100 keeps every key → the estimate IS the exact count;
    lower rates are deterministic (md5, no RNG) so two runs agree."""
    l, r = _frames(spark)
    full = join_cardinality_estimate(
        l, r, "o_custkey", "c_custkey", sample_pct=100
    ).collect()[0][0]
    assert full == 42
    e1 = join_cardinality_estimate(l, r, "o_custkey", "c_custkey", sample_pct=20)
    e2 = join_cardinality_estimate(l, r, "o_custkey", "c_custkey", sample_pct=20)
    assert e1.collect()[0][0] == e2.collect()[0][0]


def test_estimate_rejects_non_divisor_sample_pct():
    with pytest.raises(ValueError, match="divide 100"):
        join_cardinality_estimate(None, None, "a", "b", sample_pct=30)


def test_estimate_matches_unrolled_duckdb_arithmetic(spark, tmp_path):
    """Cross-engine parity, drafted as the future registered query's
    oracle will spell it: md5-bucket key sampling (functions/hashing.py
    discipline), per-key counts over non-NULL sampled keys, integer
    scale factor — every value an exact BIGINT, no floats anywhere."""
    l, r = _frames(spark)
    l.write.parquet(f"{tmp_path}/orders.parquet")
    r.write.parquet(f"{tmp_path}/customer.parquet")
    pct = 50
    got = join_cardinality_estimate(
        l, r, "o_custkey", "c_custkey", sample_pct=pct
    ).collect()[0][0]
    sql = f"""
WITH ca AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM read_parquet('{tmp_path}/orders.parquet/*.parquet')
  WHERE o_custkey IS NOT NULL
    AND ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::UBIGINT % 100 < {pct}
  GROUP BY 1
),
cb AS (
  SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM read_parquet('{tmp_path}/customer.parquet/*.parquet')
  WHERE c_custkey IS NOT NULL
    AND ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 100 < {pct}
  GROUP BY 1
)
SELECT CAST(coalesce(sum(ca.cnt * cb.cnt), 0) * {100 // pct} AS BIGINT) AS est_cardinality
FROM ca JOIN cb USING (k)
"""
    want = duckdb.sql(sql).fetchall()[0][0]
    assert got == want


def test_estimate_concentrates_on_fixture_join(spark):
    """On the sf0.001 orders⋈customer join the 10% coordinated-key
    estimate lands within a loose band of the exact count — the
    estimator's variance bound is statistical, but this fixed corpus +
    fixed hash is deterministic, so the band is a stable regression
    pin, not a flaky tolerance."""
    from tests.conftest import SF_DIR
    from mapreduce_system_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders", columns=["o_custkey"])
    cust = load_table(spark, SF_DIR, "customer", columns=["c_custkey"])
    exact = join_cardinality_exact(
        orders, cust, "o_custkey", "c_custkey"
    ).collect()[0][0]
    est = join_cardinality_estimate(
        orders, cust, "o_custkey", "c_custkey", sample_pct=10
    ).collect()[0][0]
    assert exact > 0
    assert 0.5 * exact <= est <= 1.5 * exact, (est, exact)


def test_plan_never_materializes_the_row_join(spark):
    """Both mechanisms join COUNT relations only: the physical plan must
    aggregate each side before any join (no fact-row join), which is the
    whole point of estimating."""
    from mapreduce_system_spark.plans.checks import formatted_plan

    l, r = _frames(spark)
    for df in (
        join_cardinality_exact(l, r, "o_custkey", "c_custkey"),
        join_cardinality_estimate(l, r, "o_custkey", "c_custkey", sample_pct=10),
    ):
        plan = formatted_plan(df)
        join_pos = plan.find("Join")
        agg_pos = plan.find("HashAggregate")
        assert join_pos != -1 and agg_pos != -1
        # the aggregate appears below (later in formatted output = deeper
        # in the tree = earlier in execution) the join's inputs: assert
        # at least two aggregates exist besides the final one
        assert plan.count("HashAggregate") >= 3, plan
