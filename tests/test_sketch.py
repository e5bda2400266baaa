"""Sketch-verified frequent items (operators/sketch.py) — staged r12 as
an r13 debut candidate; the registered query will spell exactly this
oracle algebra (the basket/cardinality staging pattern)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.sketch import frequent_items_verified

# skewed: 'a' 40%, 'b' 25%, long tail of singletons + NULLs
_ITEMS = ["a"] * 16 + ["b"] * 10 + ["c"] * 5 + list("defghij") + [None, None]


def _df(spark):
    return spark.createDataFrame([(v,) for v in _ITEMS], "k string")


def test_frequent_items_match_exact_relation(spark):
    """The verified output IS the exact frequent-item relation: every
    item > support*N present with exact counts, the sketch's false
    positives gone, NULLs excluded from items and from N."""
    out = {
        r.item: (r.cnt, r.share)
        for r in frequent_items_verified(_df(spark), "k", support=0.12).collect()
    }
    n = len([v for v in _ITEMS if v is not None])
    want = {
        v: (_ITEMS.count(v), _ITEMS.count(v) / n)
        for v in {x for x in _ITEMS if x}
        if _ITEMS.count(v) > 0.12 * n
    }
    assert out == want and set(out) == {"a", "b", "c"}


def test_frequent_items_no_false_negatives_on_random_corpora(spark):
    """The one-sided sketch guarantee, fuzzed: on ANY corpus the verified
    relation equals the exact groupBy+threshold relation (a dropped truly
    frequent item — the only failure the design cannot survive — would
    show as a missing row)."""

    @given(
        rows=st.lists(
            st.sampled_from([None, "x", "y", "z", "w", "v"]),
            min_size=0,
            max_size=30,
        ),
        support=st.sampled_from([0.05, 0.2, 0.5]),
    )
    @settings(max_examples=8, deadline=None)
    def check(rows, support):
        df = spark.createDataFrame([(v,) for v in rows] or [], "k string")
        got = {
            (r.item, r.cnt)
            for r in frequent_items_verified(df, "k", support=support).collect()
        }
        vals = [v for v in rows if v is not None]
        n = len(vals)
        want = {
            (v, vals.count(v))
            for v in set(vals)
            if vals.count(v) > support * n
        }
        assert got == want, (rows, support, got, want)

    check()


def test_frequent_items_empty_and_validation(spark):
    empty = spark.createDataFrame([], "k string")
    assert frequent_items_verified(empty, "k").collect() == []
    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    assert frequent_items_verified(nulls, "k").collect() == []
    with pytest.raises(ValueError, match="support"):
        frequent_items_verified(empty, "k", support=0.0)


def test_frequent_items_match_unrolled_duckdb_oracle(spark, tmp_path):
    """Cross-engine parity, drafted as the future registered query's
    oracle will spell it: the oracle computes the exact relation directly
    (no sketch — the no-false-negative guarantee is what makes the two
    AGREE), counts as BIGINT, share as one double division of exact
    operands."""
    _df(spark).write.parquet(f"{tmp_path}/t.parquet")
    got = sorted(
        (r.item, r.cnt, r.share)
        for r in frequent_items_verified(_df(spark), "k", support=0.12).collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
WITH v AS (SELECT k AS item FROM read_parquet('{tmp_path}/t.parquet/*.parquet')
           WHERE k IS NOT NULL),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
c AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1)
SELECT item, cnt, CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE) AS share
FROM c CROSS JOIN n
WHERE cnt > 0.12 * n.n
"""
        ).fetchall()
    )
    assert got == want


def test_frequent_items_filter_reaches_the_scan(spark):
    """The 100 TB claim: the candidate isin() must push to the scan of
    the verification aggregate — a post-scan filter would read every
    row's column anyway, which is merely the full groupBy with extra
    steps."""
    from mapreduce_system_spark.plans.checks import formatted_plan

    df = frequent_items_verified(_df(spark), "k", support=0.12)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the isin literals appear in a Filter node feeding the aggregate
    assert plan.count("HashAggregate") >= 2, plan
