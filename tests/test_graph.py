"""PageRank operator: probability-mass conservation, known-graph exact
values, and the query's structural properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_MID


def test_pagerank_on_known_graph_matches_hand_computation(spark):
    """Undirected path a—b—c: by symmetry a and c tie and b leads.
    One iteration from uniform: r(b) = 0.15/3 + 0.85*(1/3 + 1/3)... —
    pin the exact 3-iteration recurrence computed by hand."""
    from mapreduce_system_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}

    # hand recurrence: deg a=1, b=2, c=1; base = 0.15/3
    base, d = 0.15 / 3, 0.85
    r = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    for _ in range(3):
        contrib = {
            "a": r["b"] * (1.0 / 2),
            "c": r["b"] * (1.0 / 2),
            "b": r["a"] * (1.0 / 1) + r["c"] * (1.0 / 1),
        }
        r = {k: base + d * contrib[k] for k in r}
    for k in r:
        assert abs(got[k] - r[k]) < 1e-12, (k, got[k], r[k])
    assert got["b"] > got["a"] == got["c"]


def test_pagerank_conserves_probability_mass(spark):
    """With no dangling nodes (undirected input), total rank is exactly
    1 after every iteration count."""
    from mapreduce_system_spark.operators.graph import pagerank
    from mapreduce_system_spark.queries.fresh7d import q_graph_pagerank

    out = q_graph_pagerank(spark, SF_DIR_MID)
    total_ppm = out.agg(F.sum("rank_ppm")).first()[0]
    assert abs(total_ppm - 1_000_000) < 1.0  # rounding of 1600 rows

    e = spark.createDataFrame([("x", "y"), ("y", "x")], ["src", "dst"])
    for it in (1, 5):
        s = pagerank(e, iterations=it).agg(F.sum("rank")).first()[0]
        assert abs(s - 1.0) < 1e-12


def test_pagerank_query_ranks_suppliers_above_customers(spark):
    """Suppliers aggregate ~15x the fan-in of customers in the purchase
    graph, so the mean supplier rank must dominate; both node families
    are complete (1500 customers + 100 suppliers at sf0.01)."""
    from mapreduce_system_spark.queries.fresh7d import q_graph_pagerank

    rows = q_graph_pagerank(spark, SF_DIR_MID).collect()
    cust = [r.rank_ppm for r in rows if r.node.startswith("c")]
    supp = [r.rank_ppm for r in rows if r.node.startswith("s")]
    assert len(cust) == 1500 and len(supp) == 100
    assert min(supp) > max(cust)
    assert all(r.rank_ppm > 0 for r in rows)
