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


def test_r15_driver_window_composition():
    """IMPORT ORDER IS LOAD-BEARING (queries/__init__.py): the driver's
    correctness gate covers the FIRST 50 registered queries. Pin the r15
    window EXACTLY (module granularity per the rotation plan in the
    package docstring) so an accidental import reorder — or a module
    gaining a query — can't silently rotate evidence-stale or brand-new
    queries out of the gate. Update deliberately with each rotation."""
    expected_modules = [
        ("fresh11", 3),      # first-ever driver rows (registered r14)
        ("streaming", 8),    # the r11 cohort from here (VERDICT r14 #1)
        ("fresh", 4),
        ("fresh8e", 2),
        ("fresh8c", 3),
        ("fresh8a", 2),
        ("fresh7d", 1),
        ("mrcore", 9),       # the oldest 27 of the r12 cohort from here
        ("pipeline", 8),
        ("textstats2", 2),
        ("fresh7b", 3),
        ("fresh8b", 4),
        ("fresh8d", 1),      # its first query only; tail opens r16
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
    # the zero-driver-row trio leads the window (VERDICT r14 #1)
    assert window[:3] == [
        "stream_interval_join_outer",
        "txt_rrf_fusion",
        "emb_matryoshka_profile",
    ]
    # fresh8d's remaining queries sit immediately past the line, then
    # this round's past-window registrations (fresh12 wire-in-N+1 trio,
    # fresh13 same-round pair — the fresh10 precedent): first driver
    # rows come with the r16 window lead, not by displacing r15
    # rotation debt
    assert names[53:58] == [
        "graph_k_core",
        "agg_histogram_sketch_rollup",
        "stream_two_stage_windowed",
        "rel_funnel_time_bounded",
        "dedup_bloom_prefilter",
    ]
    # the streaming r11 cohort sits INSIDE the window at slots 4-11
    # (indices 3-10), right after the fresh11 debut trio (VERDICT r14 #1)
    stream_mod = [
        i for i, n in enumerate(names)
        if QUERIES[n].__module__.endswith(".streaming")
    ]
    assert stream_mod == list(range(3, 11)), stream_mod
