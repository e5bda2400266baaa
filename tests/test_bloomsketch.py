"""Mergeable Bloom membership sketch (operators/bloomsketch.py) —
staged r15 for an r16/r17 debut (``dedup_bloom_prefilter`` planned);
the registered query will spell exactly the position-set oracle drafted
here (the histsketch staging pattern). Every step is deterministic
md5 arithmetic, so parity is pinned against an independent pure-Python
reference AND a DuckDB draft, plus the one-sided-error invariant and
exact-merge law the operator exists for."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from mapreduce_system_spark.operators.bloomsketch import (
    bloom_build,
    bloom_maybe_contains,
    bloom_params,
)

_M, _K = 4096, 4


def _ref_positions(key: str, m: int = _M, k: int = _K) -> set[int]:
    return {
        int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    }


def _ref_sketch(keys, m: int = _M, k: int = _K) -> set[int]:
    out: set[int] = set()
    for key in keys:
        if key is not None:
            out |= _ref_positions(str(key), m, k)
    return out


def test_bloom_build_matches_reference_positions(spark):
    keys = ["alpha", "beta", "gamma", None, "alpha"]  # dup + NULL dropped
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r.pos for r in bloom_build(df, "key", m=_M, k=_K).collect()}
    assert got == _ref_sketch(keys)


def test_bloom_no_false_negatives_and_merge_law(spark):
    a = [f"doc-{i}" for i in range(60)]
    b = [f"doc-{i}" for i in range(40, 100)]
    da = spark.createDataFrame([(k,) for k in a], "key string")
    db = spark.createDataFrame([(k,) for k in b], "key string")
    sa, sb = bloom_build(da, "key", m=_M, k=_K), bloom_build(db, "key", m=_M, k=_K)
    # EXACT merge: union-distinct of position sets == sketch of the union
    merged = sa.unionByName(sb).distinct()
    both = spark.createDataFrame([(k,) for k in set(a) | set(b)], "key string")
    want = {r.pos for r in bloom_build(both, "key", m=_M, k=_K).collect()}
    assert {r.pos for r in merged.collect()} == want
    # one-sided error: every inserted key must read maybe_seen=true
    verdicts = {
        r.key: r.maybe_seen
        for r in bloom_maybe_contains(da, sa, "key", m=_M, k=_K).collect()
    }
    assert all(verdicts[k] for k in a)


def test_bloom_definitely_new_is_certain(spark):
    """maybe_seen=false PROVES non-membership: cross-check every false
    verdict against the exact set. (True verdicts may be false
    positives — that is the sketch's documented trade.)"""
    corpus = [f"c-{i}" for i in range(200)]
    batch = [f"c-{i}" for i in range(150, 250)] + ["x-1", "x-2"]
    dc = spark.createDataFrame([(k,) for k in corpus], "key string")
    db = spark.createDataFrame([(k,) for k in batch], "key string")
    sk = bloom_build(dc, "key", m=_M, k=_K)
    out = {
        r.key: r.maybe_seen
        for r in bloom_maybe_contains(db, sk, "key", m=_M, k=_K).collect()
    }
    exact = set(corpus)
    for key, seen in out.items():
        if not seen:
            assert key not in exact, key
    for key in set(batch) & exact:  # no false negatives
        assert out[key], key


def test_bloom_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the planned ``dedup_bloom_prefilter`` will
    interpolate: corpus positions (explode k probes via UNION ALL of
    the per-i hash) -> distinct; batch verdict = all-k-hit."""
    corpus = [(f"d{i}",) for i in range(50)]
    batch = [(f"d{i}",) for i in range(30, 70)] + [("zz",)]
    dc = spark.createDataFrame(corpus, "key string")
    db = spark.createDataFrame(batch, "key string")
    dc.write.parquet(f"{tmp_path}/corpus.parquet")
    db.write.parquet(f"{tmp_path}/batch.parquet")
    got = sorted(
        (r.key, r.maybe_seen)
        for r in bloom_maybe_contains(
            db, bloom_build(dc, "key", m=_M, k=_K), "key", m=_M, k=_K
        ).collect()
    )
    probes = " UNION ALL ".join(f"SELECT {i} AS i" for i in range(_K))
    sql = f"""
WITH probes AS ({probes}),
corpus AS (
  SELECT DISTINCT CAST(key AS VARCHAR) AS key
  FROM read_parquet('{tmp_path}/corpus.parquet/*.parquet')
  WHERE key IS NOT NULL
),
sketch AS (
  SELECT DISTINCT
    ('0x' || substr(md5(c.key || ':' || i), 1, 8))::UBIGINT % {_M} AS pos
  FROM corpus c CROSS JOIN probes
),
batch AS (
  SELECT DISTINCT CAST(key AS VARCHAR) AS key
  FROM read_parquet('{tmp_path}/batch.parquet/*.parquet')
  WHERE key IS NOT NULL
),
bpos AS (
  SELECT b.key,
    ('0x' || substr(md5(b.key || ':' || i), 1, 8))::UBIGINT % {_M} AS pos
  FROM batch b CROSS JOIN probes
)
SELECT key,
       count(*) = count(*) FILTER (WHERE pos IN (SELECT pos FROM sketch))
         AS maybe_seen
FROM bpos GROUP BY key ORDER BY key
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_bloom_fuzz_30_random_corpora(spark):
    """30 seeded random corpus/batch splits in ONE Spark run (disjoint
    key prefixes) vs the pure-Python reference — verdict-for-verdict."""
    import random

    corpus_keys: list = []
    batch_keys: list = []
    want: dict = {}
    per_g_corpus: dict = {}
    for g in range(30):
        rng = random.Random(7400 + g)
        uni = [f"g{g}-{i}" for i in range(rng.randint(5, 40))]
        cut = rng.randint(1, len(uni))
        c = uni[:cut]
        b = rng.sample(uni, min(len(uni), rng.randint(1, 20)))
        corpus_keys += c
        batch_keys += b
        per_g_corpus[g] = set(c)
    sketch_ref = _ref_sketch(corpus_keys)
    for key in set(batch_keys):
        want[key] = _ref_positions(key) <= sketch_ref
    dc = spark.createDataFrame([(k,) for k in corpus_keys], "key string")
    db = spark.createDataFrame([(k,) for k in batch_keys], "key string")
    got = {
        r.key: r.maybe_seen
        for r in bloom_maybe_contains(
            db, bloom_build(dc, "key", m=_M, k=_K), "key", m=_M, k=_K
        ).collect()
    }
    assert got == want
    # invariant: inserted keys always read seen
    for g, cs in per_g_corpus.items():
        for key in cs & set(batch_keys):
            assert got[key], key


def test_bloom_rejects_bad_params(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="m must"):
        bloom_build(df, "key", m=0)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(df, "key", k=0)
    with pytest.raises(ValueError, match="m must"):
        bloom_maybe_contains(df, df.select(df.key.alias("pos")), "key", m=0)
    with pytest.raises(ValueError, match="k must"):
        bloom_maybe_contains(df, df.select(df.key.alias("pos")), "key", k=0)


def test_bloom_params_pins_the_sizing_formula():
    """m = ceil(-n ln p / ln^2 2), k = max(1, round(-log2 p)) — the
    executable form of "callers size m" (VERDICT r16 #5). Values
    hand-computed; k depends only on the target (the property that
    lets a registered query keep a static probes CTE while deriving m
    from the measured history count)."""
    import math

    assert bloom_params(1000, 0.01) == (9586, 7)
    # hand-check: -1000*ln(.01) = 4605.170..., / ln(2)^2 = 9585.058...
    assert bloom_params(0, 0.01) == (1, 7)       # empty history: any m works
    assert bloom_params(1000, 0.5) == (1443, 1)  # k floor at 1
    for p in (0.5, 0.1, 0.01, 0.001):
        for n in (1, 10, 450, 10**6, 10**9):
            m, k = bloom_params(n, p)
            assert k == max(1, round(-math.log2(p)))  # n-independent
            assert m >= max(1, n)  # m grows at least linearly in n
    # real fp rate at the design point stays near the target:
    # (1 - e^{-kn/m})^k for n=10^6 at p=0.01
    m, k = bloom_params(10**6, 0.01)
    real = (1 - math.exp(-k * 10**6 / m)) ** k
    assert real < 0.011
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_expected"):
        bloom_params(-1, 0.01)
    for bad in (0.0, 1.0, -0.1, 2.0):
        with _pytest.raises(ValueError, match="fp_target"):
            bloom_params(10, bad)
