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


def test_r10_driver_window_composition():
    """IMPORT ORDER IS LOAD-BEARING (queries/__init__.py): the driver's
    correctness gate covers the FIRST 50 registered queries. Pin the r10
    window so an accidental import reorder (or a module gaining a query)
    can't silently rotate evidence-stale or brand-new queries out of the
    gate. Update this pin deliberately with each round's rotation plan."""
    names = list(QUERIES)
    window = names[:50]
    # this round's new queries MUST have driver rows
    for new in ("sim_topk_pq", "stream_stateful_sessions_tws", "mm_image_rgb_stats"):
        assert new in window, f"{new} fell out of the r10 window"
    # the rotation cohort fills the window: temporal(5) advanced(7)
    # similarity(9) relational(12) dedup(8) sinks(5) fresh6(3) mm2(1)
    prefixes = {
        "fn_", "asof_", "rel_", "skew_", "agg_", "sim_", "cluster_",
        "emb_", "dedup_", "sink_", "scan_", "stream_stateful_", "mm_image_rgb",
    }
    for n in window:
        assert any(n.startswith(p) for p in prefixes), (
            f"unexpected query {n!r} inside the first-50 window"
        )
    # mr-core intentionally sits past the window this round (fresh r09
    # rows; rotate back by r12 — registry.py)
    assert all(not n.startswith("mr_") for n in window)
    assert sum(n.startswith("mr_") for n in names[50:]) == 9
