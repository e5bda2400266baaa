"""Deterministic weighted sampling (operators/sampling.py) — staged r16
for an r17/r18 debut (``pipe_weighted_sample`` planned); the registered
query will spell exactly the E-S key oracle drafted here (the
bloomsketch/cmsketch staging pattern). The score is ln(u)/w over the
repo's md5 uniform, so parity is pinned against a pure-Python reference
AND a DuckDB draft, plus the laws the operator exists for:
weight-monotone inclusion and repartition invariance."""

from __future__ import annotations

import hashlib
import math
import random

import duckdb
import pytest

from mapreduce_system_spark.operators.sampling import (
    weighted_sample,
    weighted_sample_scores,
)


def _ref_u(key: str) -> float:
    return (int(hashlib.md5(key.encode()).hexdigest()[:8], 16) + 1) / 2.0**32


def _ref_score(key: str, w: float, salt: str = "") -> float:
    return math.log(_ref_u(f"{key}{salt}")) / w


def _ref_sample(rows, k: int, salt: str = ""):
    scored = [
        (str(i), float(w), _ref_score(str(i), float(w), salt))
        for i, w in rows
        if i is not None and w is not None and w > 0
    ]
    scored.sort(key=lambda t: (-t[2], t[0]))
    return [(i, w) for i, w, _ in scored[:k]]


def test_scores_match_reference(spark):
    rows = [("a", 1.0), ("b", 10.0), ("c", 0.5), ("d", None), (None, 3.0),
            ("e", 0.0), ("f", -2.0)]
    df = spark.createDataFrame(rows, "id string, w double")
    got = {
        r.id: (r.weight, r.score)
        for r in weighted_sample_scores(df, "id", "w").collect()
    }
    # NULL id, NULL/zero/negative weight rows excluded
    assert set(got) == {"a", "b", "c"}
    for i in got:
        w, s = got[i]
        assert s == pytest.approx(_ref_score(i, w), rel=1e-12)


def test_topk_selection_matches_reference(spark):
    rng = random.Random(1632)
    rows = [(f"doc-{i}", rng.choice([0.25, 1.0, 4.0, 16.0])) for i in range(400)]
    df = spark.createDataFrame(rows, "id string, w double")
    got = [(r.id, r.weight) for r in weighted_sample(df, "id", "w", k=25).collect()]
    assert got == _ref_sample(rows, 25)


def test_salt_rekeys_the_draw(spark):
    rows = [(f"doc-{i}", 1.0) for i in range(300)]
    df = spark.createDataFrame(rows, "id string, w double")
    a = {r.id for r in weighted_sample(df, "id", "w", k=20, salt="#e1").collect()}
    b = {r.id for r in weighted_sample(df, "id", "w", k=20, salt="#e2").collect()}
    assert a == {i for i, _ in _ref_sample(rows, 20, salt="#e1")}
    assert b == {i for i, _ in _ref_sample(rows, 20, salt="#e2")}
    assert a != b  # distinct epochs draw distinct sets (overwhelmingly)


def test_weight_monotone_inclusion(spark):
    """Raising one row's weight can move it INTO the sample, never out:
    d(ln u / w)/dw >= 0. Check by sweeping one doc's weight upward and
    asserting inclusion is a monotone boolean sequence."""
    rng = random.Random(1633)
    base = [(f"doc-{i}", 1.0 + rng.random()) for i in range(120)]
    seen_in = False
    for w in [0.05, 0.5, 2.0, 20.0, 2000.0]:
        rows = base + [("target", w)]
        df = spark.createDataFrame(rows, "id string, w double")
        got = {r.id for r in weighted_sample(df, "id", "w", k=15).collect()}
        assert got == {i for i, _ in _ref_sample(rows, 15)}
        if seen_in:
            assert "target" in got, f"target dropped out at w={w}"
        seen_in = seen_in or ("target" in got)
    assert seen_in  # at w=2000 over 120 unit-ish weights it must be in


def test_repartition_invariance(spark):
    rows = [(f"doc-{i}", float(1 + i % 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "id string, w double")
    a = [(r.id, r.weight) for r in weighted_sample(df, "id", "w", k=40).collect()]
    b = [
        (r.id, r.weight)
        for r in weighted_sample(df.repartition(13), "id", "w", k=40).collect()
    ]
    c = [
        (r.id, r.weight)
        for r in weighted_sample(df.coalesce(1), "id", "w", k=40).collect()
    ]
    assert a == b == c == _ref_sample(rows, 40)


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the planned ``pipe_weighted_sample`` will
    interpolate: ln((md5-uniform + 1) / 2^32) / weight, ORDER BY score
    DESC, id LIMIT k."""
    rng = random.Random(1634)
    rows = [(f"doc-{i:04d}", float(rng.randint(1, 40))) for i in range(350)]
    df = spark.createDataFrame(rows, "id string, w double")
    df.write.parquet(f"{tmp_path}/docs.parquet")
    got = [
        (r.id, r.weight)
        for r in weighted_sample(df, "id", "w", k=30).collect()
    ]
    sql = f"""
SELECT id, w AS weight
FROM (
  SELECT CAST(id AS VARCHAR) AS id, w,
    ln((('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::UBIGINT + 1)
       / 4294967296.0) / w AS score
  FROM read_parquet('{tmp_path}/docs.parquet/*.parquet')
  WHERE id IS NOT NULL AND w IS NOT NULL AND w > 0
)
ORDER BY score DESC, id LIMIT 30
"""
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


def test_takeordered_plan_no_full_sort(spark):
    """The selection must execute as TakeOrderedAndProject (partial
    per-partition top-k), not a global Sort + Exchange + Limit."""
    rows = [(f"doc-{i}", 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id string, w double").repartition(8)
    plan = (
        weighted_sample(df, "id", "w", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_rejects_bad_k(spark):
    df = spark.createDataFrame([("a", 1.0)], "id string, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", k=0)
