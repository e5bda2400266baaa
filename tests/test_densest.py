"""Densest-subgraph greedy peel (operators/densest.py) — staged r17
for an r18+ debut (``graph_densest_peel`` planned); the registered
query will spell the unrolled-CTE oracle drafted here (the
k-truss/ccjump staging pattern). Pinned: the pure-Python reference,
the 2(1+eps)-approximation law on a planted clique (the guarantee the
peel exists for), the census monotonicity law, the DuckDB draft, and
bad-params rejection."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

from mapreduce_system_spark import caches
from mapreduce_system_spark.operators.densest import densest_subgraph_rounds

_EPS = 0.5


@pytest.fixture(autouse=True)
def _release_tracked(spark):
    yield
    caches.release()


def _ref_densest(edges, eps, rounds):
    """(round, n_nodes, n_edges, density) rows, synchronous peel at
    threshold 2*(1+eps)*rho — densities unrounded (compare approx)."""
    cur = {
        (min(a, b), max(a, b))
        for a, b in edges
        if a is not None and b is not None and a != b
    }
    rows = []
    for r in range(rounds + 1):
        nodes = {x for e in cur for x in e}
        m, n = len(cur), len(nodes)
        rows.append((r, n, m, (m / n) if n else 0.0))
        if r == rounds:
            break
        rho = m / n if n else 0.0
        deg = Counter(x for e in cur for x in e)
        keep = {v for v in nodes if deg[v] > 2.0 * (1.0 + eps) * rho}
        cur = {(u, v) for (u, v) in cur if u in keep and v in keep}
    return rows


def _assert_matches(got_rows, want_rows):
    got = sorted((r.round, r.n_nodes, r.n_edges, r.density) for r in got_rows)
    assert [(g[0], g[1], g[2]) for g in got] == [
        (w[0], w[1], w[2]) for w in want_rows
    ]
    for g, w in zip(got, want_rows):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


def test_matches_reference_on_seeded_graphs(spark):
    for seed, n, p in ((9200, 18, 0.3), (9201, 25, 0.15), (9202, 12, 0.6)):
        rng = random.Random(seed)
        edges = [
            (a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < p
        ] or [(0, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = densest_subgraph_rounds(df, epsilon=_EPS, rounds=4).collect()
        _assert_matches(got, _ref_densest(edges, _EPS, 4))
        caches.release()


def test_planted_clique_approximation_law(spark):
    """Bahmani et al. Thm 1: the best prefix density over the peel is
    >= rho* / (2(1+eps)). A planted K12 (density 5.5) inside sparse
    background pins the guarantee end to end."""
    rng = random.Random(9210)
    clique = [(a, b) for a in range(12) for b in range(a + 1, 12)]
    background = [
        (100 + i, 100 + i + 1) for i in range(80)
    ] + [(200 + rng.randint(0, 60), 300 + rng.randint(0, 60)) for _ in range(50)]
    bridge = [(0, 100), (5, 200)]
    edges = clique + background + bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = densest_subgraph_rounds(df, epsilon=_EPS, rounds=8).collect()
    best = max(r.density for r in rows)
    rho_star = 5.5  # K12: 66 edges / 12 nodes
    assert best >= rho_star / (2.0 * (1.0 + _EPS)) - 1e-9
    # and the peel actually converged onto the clique here: the best
    # round's graph is exactly K12
    best_row = max(rows, key=lambda r: r.density)
    assert (best_row.n_nodes, best_row.n_edges) == (12, 66)
    _assert_matches(rows, _ref_densest(edges, _EPS, 8))


def test_census_is_monotone_and_normalizes_input(spark):
    """n_nodes/n_edges never increase over rounds; messy input (dup,
    reversed, self-loop, NULL) normalizes exactly as k-core's rule."""
    edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (3, 3), (None, 1), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = sorted(
        densest_subgraph_rounds(df, epsilon=_EPS, rounds=3).collect(),
        key=lambda r: r.round,
    )
    assert rows[0].n_edges == 4  # {1-2, 2-3, 1-3, 4-5}
    assert rows[0].n_nodes == 5
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    clean = [(1, 2), (2, 3), (1, 3), (4, 5)]
    _assert_matches(rows, _ref_densest(clean, _EPS, 3))


def _cte_rounds(rounds: int, thr: float) -> str:
    parts = []
    for r in range(rounds):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}
  ) GROUP BY node
),
k{r} AS MATERIALIZED (
  SELECT node FROM d{r}
  WHERE d > {thr!r} * ((SELECT CAST(count(*) AS BIGINT) FROM e{r})
                       / nullif((SELECT CAST(count(*) AS BIGINT) FROM d{r}), 0))
),
e{r + 1} AS MATERIALIZED (
  SELECT u, v FROM e{r}
  WHERE u IN (SELECT node FROM k{r}) AND v IN (SELECT node FROM k{r})
)"""
        )
    return ",\n".join(parts)


def _census_select(rounds: int) -> str:
    rows = []
    for r in range(rounds + 1):
        rows.append(
            f"""SELECT CAST({r} AS BIGINT) AS round,
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT DISTINCT node FROM (
            SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}))) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS n_edges,
       round(coalesce(
         (SELECT CAST(count(*) AS BIGINT) FROM e{r})
           / nullif((SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT DISTINCT node FROM (
                  SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}))), 0),
         0.0), 6) AS density"""
        )
    return "\nUNION ALL\n".join(rows)


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The unrolled-CTE algebra the planned ``graph_densest_peel`` will
    interpolate — MATERIALIZED per round (the k-truss re-expansion
    lesson), threshold factor emitted as ONE repr'd literal on both
    engines."""
    rng = random.Random(9220)
    n = 22
    edges = [
        (a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    df.write.parquet(f"{tmp_path}/edges.parquet")
    rounds = 3
    got = sorted(
        (r.round, r.n_nodes, r.n_edges, r.density)
        for r in densest_subgraph_rounds(df, epsilon=_EPS, rounds=rounds).collect()
    )
    thr = 2.0 * (1.0 + _EPS)
    sql = f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM read_parquet('{tmp_path}/edges.parquet/*.parquet')
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
),
{_cte_rounds(rounds, thr)}
{_census_select(rounds)}
ORDER BY round
"""
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-9)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="epsilon"):
        densest_subgraph_rounds(df, epsilon=-0.1)
    with pytest.raises(ValueError, match="rounds"):
        densest_subgraph_rounds(df, rounds=0)
