"""Mergeable Count-Min frequency sketch (operators/cmsketch.py) —
staged r16 for an r17/r18 debut (``agg_cms_heavy_hitters`` planned);
the registered query will spell exactly the counter-table oracle
drafted here (the bloomsketch/histsketch staging pattern). Every step
is deterministic md5 + integer arithmetic, so parity is pinned against
an independent pure-Python reference AND a DuckDB draft, plus the
one-sided-error invariant (est >= exact, est == 0 proves absence) and
the exact-merge law the operator exists for."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import duckdb
import pytest

from mapreduce_system_spark.operators.cmsketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)

_W, _D = 512, 4


def _ref_pos(key: str, r: int, w: int = _W) -> int:
    return int(hashlib.md5(f"{key}:{r}".encode()).hexdigest()[:8], 16) % w


def _ref_sketch(keys, w: int = _W, d: int = _D) -> dict[tuple[int, int], int]:
    cells: Counter = Counter()
    for key, wt in keys:
        if key is not None:
            for r in range(d):
                cells[(r, _ref_pos(str(key), r, w))] += wt
    return {c: n for c, n in cells.items() if n != 0}


def _ref_estimate(key: str, cells, w: int = _W, d: int = _D) -> int:
    return min(cells.get((r, _ref_pos(key, r, w)), 0) for r in range(d))


def test_cms_build_matches_reference_cells(spark):
    keys = ["alpha", "beta", "gamma", None, "alpha", "alpha", "beta"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r.r, r.pos): r.cnt for r in cms_build(df, "key", w=_W, d=_D).collect()}
    assert got == _ref_sketch([(k, 1) for k in keys])


def test_cms_weighted_build(spark):
    rows = [("a", 3), ("b", 2), ("a", 5), ("c", None)]
    df = spark.createDataFrame(rows, "key string, wt int")
    got = {
        (r.r, r.pos): r.cnt
        for r in cms_build(df, "key", w=_W, d=_D, weight_col="wt").collect()
    }
    # NULL weight counts 0 — c contributes nothing (cells pruned at 0
    # only if ALL keys hashing there sum to 0; build c's cells explicitly)
    want = _ref_sketch([("a", 3), ("b", 2), ("a", 5), ("c", 0)])
    assert got == want


def test_cms_one_sided_and_absence_proof(spark):
    corpus = [f"tok-{i}" for i in range(300) for _ in range(i % 7 + 1)]
    exact = Counter(corpus)
    df = spark.createDataFrame([(k,) for k in corpus], "key string")
    sk = cms_build(df, "key", w=_W, d=_D)
    queries = spark.createDataFrame(
        [(k,) for k in list(exact)[:80] + ["never-1", "never-2"]], "key string"
    )
    est = {r.key: r.est for r in cms_estimate(queries, sk, "key", w=_W, d=_D).collect()}
    for key, e in est.items():
        assert e >= exact.get(key, 0), (key, e, exact.get(key, 0))
    # est == 0 proves absence — and conversely a present key may never read 0
    for key in list(exact)[:80]:
        assert est[key] >= 1


def test_cms_merge_law(spark):
    a = [(f"k{i % 40}", 1) for i in range(200)]
    b = [(f"k{i % 55}", 1) for i in range(150)]
    da = spark.createDataFrame(a, "key string, wt int")
    db = spark.createDataFrame(b, "key string, wt int")
    sa = cms_build(da, "key", w=_W, d=_D)
    sb = cms_build(db, "key", w=_W, d=_D)
    merged = {(r.r, r.pos): r.cnt for r in cms_merge(sa, sb).collect()}
    both = spark.createDataFrame(a + b, "key string, wt int")
    want = {(r.r, r.pos): r.cnt for r in cms_build(both, "key", w=_W, d=_D).collect()}
    assert merged == want


def test_cms_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the planned ``agg_cms_heavy_hitters`` will
    interpolate: per-row d cells via UNION ALL of the per-r hash ->
    groupBy sum; estimate = min over r of coalesce'd cell lookups."""
    corpus = [f"w{i % 23}" for i in range(400)]
    df = spark.createDataFrame([(k,) for k in corpus], "key string")
    df.write.parquet(f"{tmp_path}/corpus.parquet")
    sk = cms_build(df, "key", w=_W, d=_D)
    queries = spark.createDataFrame([(f"w{i}",) for i in range(30)], "key string")
    got = sorted(
        (r.key, r.est)
        for r in cms_estimate(queries, sk, "key", w=_W, d=_D).collect()
    )
    rows = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(_D))
    qkeys = " UNION ALL ".join(f"SELECT 'w{i}' AS key" for i in range(30))
    sql = f"""
WITH rs AS ({rows}),
corpus AS (
  SELECT CAST(key AS VARCHAR) AS key
  FROM read_parquet('{tmp_path}/corpus.parquet/*.parquet')
  WHERE key IS NOT NULL
),
sketch AS (
  SELECT r,
    ('0x' || substr(md5(c.key || ':' || r), 1, 8))::UBIGINT % {_W} AS pos,
    count(*)::BIGINT AS cnt
  FROM corpus c CROSS JOIN rs
  GROUP BY 1, 2
),
q AS ({qkeys}),
cells AS (
  SELECT q.key, rs.r,
    ('0x' || substr(md5(q.key || ':' || rs.r), 1, 8))::UBIGINT % {_W} AS pos
  FROM q CROSS JOIN rs
)
SELECT c.key, min(coalesce(s.cnt, 0)) AS est
FROM cells c LEFT JOIN sketch s ON s.r = c.r AND s.pos = c.pos
GROUP BY c.key ORDER BY c.key
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_cms_fuzz_multi_corpora(spark):
    """20 seeded random corpora in ONE Spark run (disjoint key prefixes
    in one DataFrame): one-sided error everywhere; overcount bounded by
    the e/w * N Markov bound with slack (w=512, N<=600 -> eps*N < 4,
    allow <= 8 for the union over rows)."""
    rng = random.Random(1631)
    rows = []
    truths: dict[int, Counter] = {}
    for c in range(20):
        n = rng.randint(100, 600)
        keys = [f"c{c}|t{rng.randint(0, 80)}" for _ in range(n)]
        truths[c] = Counter(keys)
        rows += [(k,) for k in keys]
    df = spark.createDataFrame(rows, "key string")
    sk = cms_build(df, "key", w=_W, d=_D)
    allq = spark.createDataFrame(
        [(k,) for t in truths.values() for k in t], "key string"
    )
    est = {r.key: r.est for r in cms_estimate(allq, sk, "key", w=_W, d=_D).collect()}
    total = sum(sum(t.values()) for t in truths.values())
    for c, t in truths.items():
        for key, exact in t.items():
            assert est[key] >= exact
            assert est[key] - exact <= max(8, 6 * total // _W), (
                key, est[key], exact, total
            )


def test_cms_rejects_bad_params(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError):
        cms_build(df, "key", w=0, d=4)
    with pytest.raises(ValueError):
        cms_build(df, "key", w=16, d=0)
    with pytest.raises(ValueError):
        cms_estimate(df, cms_build(df, "key"), "key", w=16, d=0)
