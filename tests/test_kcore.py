"""k-core peeling (operators/graph.py::k_core_peel) — staged r14 for an
r15/r16 debut; the registered query will spell exactly the unrolled
per-round CTE drafted here (the LPA staging pattern). Synchronous
bounded rounds over the edge relation make the recurrence a pure
function of the edge set — parity is pinned against an independent
pure-Python reference AND the DuckDB CTE."""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_system_spark.operators.graph import k_core_peel

# a 4-clique (3-core), a pendant chain hanging off it, a triangle
# (2-core), and a detached star (leaves peel, then the hub exits with
# the edge list)
_EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4
    (4, 5), (5, 6),                                    # chain off the K4
    (10, 11), (11, 12), (10, 12),                      # triangle
    (20, 21), (20, 22), (20, 23),                      # star hub 20
]


def _ref_kcore(edges, k, rounds):
    """Independent reference: synchronous peel on the edge relation."""
    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        es.add((a, b))
        es.add((b, a))
    for _ in range(rounds):
        deg: dict = {}
        for a, _b in es:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    out: dict = {}
    for a, _b in es:
        out[a] = out.get(a, 0) + 1
    return out


@pytest.mark.parametrize("k,rounds", [(2, 1), (2, 3), (3, 3), (4, 2)])
def test_kcore_matches_pure_python_reference(spark, k, rounds):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    got = {
        r.node: r.degree for r in k_core_peel(df, k, rounds=rounds).collect()
    }
    assert got == _ref_kcore(_EDGES, k, rounds)


def test_kcore_semantics_on_the_fixture_shapes(spark):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    # 3-core after enough rounds: exactly the K4 (chain + triangle +
    # star all peel)
    got3 = {
        r.node: r.degree for r in k_core_peel(df, 3, rounds=4).collect()
    }
    assert got3 == {1: 3, 2: 3, 3: 3, 4: 3}
    # 2-core: K4 + triangle survive; the chain and star peel
    got2 = {
        r.node: r.degree for r in k_core_peel(df, 2, rounds=4).collect()
    }
    assert set(got2) == {1, 2, 3, 4, 10, 11, 12}
    # convergence census: one more round changes nothing once stable
    got2b = {
        r.node: r.degree for r in k_core_peel(df, 2, rounds=5).collect()
    }
    assert got2 == got2b


def test_kcore_drops_nulls_self_loops_and_validates(spark):
    rows = [(1, 1), (1, None), (None, 2), (1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: r.degree for r in k_core_peel(df, 2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # the triangle; noise ignored
    with pytest.raises(ValueError, match="k must be"):
        k_core_peel(df, 0)
    with pytest.raises(ValueError, match="rounds"):
        k_core_peel(df, 2, rounds=0)


def test_kcore_distinct_input_fast_path_is_row_identical(spark):
    dup = _EDGES + [(2, 1), (3, 1), (11, 10)]  # reversed duplicates
    slow = {
        r.node: r.degree
        for r in k_core_peel(
            spark.createDataFrame(dup, "src long, dst long"), 2, rounds=3
        ).collect()
    }
    fast = {
        r.node: r.degree
        for r in k_core_peel(
            spark.createDataFrame(_EDGES, "src long, dst long"),
            2,
            rounds=3,
            edges_undirected_distinct=True,
        ).collect()
    }
    assert slow == fast


def _kcore_round_cte(prev: str, cur: str, k: int) -> str:
    """One unrolled synchronous peel round — the draft the registered
    oracle will interpolate."""
    return f"""
{cur} AS (
  SELECT e.u, e.v FROM {prev} e
  JOIN (SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k}) ku ON e.u = ku.u
  JOIN (SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k}) kv ON e.v = kv.u
)"""


@pytest.mark.parametrize("k,rounds", [(2, 3), (3, 3)])
def test_kcore_matches_unrolled_duckdb_oracle(spark, tmp_path, k, rounds):
    df = spark.createDataFrame(_EDGES, "src long, dst long")
    df.write.parquet(f"{tmp_path}/edges.parquet")
    got = sorted(
        (r.node, r.degree) for r in k_core_peel(df, k, rounds=rounds).collect()
    )
    ctes = ["""e0 AS (
  SELECT DISTINCT u, v FROM (
    SELECT src AS u, dst AS v FROM raw
    UNION ALL
    SELECT dst AS u, src AS v FROM raw
  ) WHERE u IS NOT NULL AND v IS NOT NULL AND u <> v
)"""]
    for r in range(rounds):
        ctes.append(_kcore_round_cte(f"e{r}", f"e{r + 1}", k))
    sql = f"""
WITH raw AS (
  SELECT src, dst FROM read_parquet('{tmp_path}/edges.parquet/*.parquet')
), {", ".join(ctes)}
SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY u ORDER BY u
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_kcore_matches_reference_on_30_random_topologies(spark):
    """Topology fuzz, the LPA sweep's shape: 30 seeded random graphs as
    disjoint id-offset components of ONE graph — k-core on a disjoint
    union is k-core per component, so a single Spark run sweeps all 30
    against the pure-Python reference."""
    import random

    all_edges: list[tuple[int, int]] = []
    want: dict = {}
    for g in range(30):
        rng = random.Random(4200 + g)
        base = (g + 1) * 100_000
        n = rng.randint(3, 13)
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.35
        ] or [(0, 1)]
        edges += [(b, a) for (a, b) in edges if rng.random() < 0.5]
        edges += [(x, x) for x in rng.sample(range(n), min(2, n))]
        offset = [(base + a, base + b) for a, b in edges]
        all_edges.extend(offset)
        want.update(_ref_kcore(offset, 2, 3))
    got = {
        r.node: r.degree
        for r in k_core_peel(
            spark.createDataFrame(all_edges, "src long, dst long"), 2, rounds=3
        ).collect()
    }
    assert got == want
