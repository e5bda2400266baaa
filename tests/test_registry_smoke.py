"""Every registered query must *execute* end-to-end at sf0.001.

Guards against the round-2 failure mode: an operator's unit test passes
(it exercises the operator with its own arguments) while the *registered*
query errors (it wires the operator differently — e.g. referencing a
column the operator dropped). Running each ``queries()`` entry through a
no-collect action catches any AnalysisException / schema mismatch at the
cheapest scale before the driver's correctness sweep does.

Streaming-parity queries are batch twins here, so they run too. The test
is parametrized per query so a failure names the broken entry directly.
"""

from __future__ import annotations

import pytest

from mapreduce_system_spark import caches
from mapreduce_system_spark.registry import QUERIES
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_query_executes(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    try:
        # noop write executes the full physical plan without materializing
        # rows on the driver — same action the bench harness uses.
        df.write.format("noop").mode("overwrite").save()
    finally:
        caches.release()


def test_every_oracle_has_a_query():
    from mapreduce_system_spark.registry import ORACLE_SQL

    dangling = set(ORACLE_SQL) - set(QUERIES)
    assert not dangling, f"oracle entries without a registered query: {dangling}"


def test_r17_driver_window_composition():
    """IMPORT ORDER IS LOAD-BEARING (queries/__init__.py): the driver's
    correctness gate covers the FIRST 50 registered queries. Pin the r17
    window EXACTLY (module granularity per the rotation plan in the
    package docstring) so an accidental import reorder — or a module
    gaining a query — can't silently rotate evidence-stale or brand-new
    queries out of the gate. Update deliberately with each rotation."""
    expected_modules = [
        ("fresh14", 2),      # zero-evidence r16 debuts (VERDICT r16 #1)
        ("fresh15", 2),      # zero-evidence r16 debuts
        ("fresh16", 1),      # zero-evidence r16 debut
        ("textstats", 7),    # the r13-stale cohort from here
        ("fresh7b2", 2),
        ("fresh7", 1),
        ("fresh7c", 2),
        ("fresh7e", 1),
        ("fresh7f", 3),
        ("multimodal", 5),
        ("fresh9", 5),
        ("fresh10", 3),      # the oldest r14 rows from here
        ("temporal", 5),
        ("advanced", 7),
        ("relational2", 4),  # r13-stale trio first (internal reorder,
                             # see relational2.py docstring) + one
                             # r16-fresh re-row at slot 50; tail opens r18
    ]
    assert sum(c for _, c in expected_modules) == 50
    names = list(QUERIES)
    window = names[:50]
    got_modules = []
    for n in window:
        mod = QUERIES[n].__module__.split(".")[-1]
        if not got_modules or got_modules[-1][0] != mod:
            got_modules.append([mod, 0])
        got_modules[-1][1] += 1
    assert [tuple(m) for m in got_modules] == expected_modules, got_modules
    # the five zero-driver-row r16 registrations lead (VERDICT r16 #1)
    assert window[:5] == [
        "graph_k_truss",
        "txt_pmi_collocations",
        "graph_components_jump",
        "stream_interval_join_full",
        "agg_cms_heavy_hitters",
    ]
    # relational2's r13-stale trio sits INSIDE the boundary (the module
    # registers them first since the r17 internal reorder)
    assert window[46:50] == [
        "rel_full_outer_join",
        "rel_pivot_priority_revenue",
        "rel_unpivot_metrics",
        "agg_distinct_stats",
    ]
    # relational2's remaining r16-fresh rows sit immediately past the
    # line, then this round's registrations (fresh17 — the
    # fresh12/13/14 wire-in-N+1 precedent): first driver rows come with
    # the r18 window lead, not by displacing r17 rotation debt
    assert names[50:54] == [
        "agg_approx_distinct",
        "agg_star_pricing",
        "dedup_sorted_neighborhood",
        "txt_kneser_ney_surprisal",
    ]
