"""Birth test for the fresh16 registration (r16, probe-first): the
invariants behind the data-chosen constants. Value parity is the
driver's job (tools/verify_local.py runs both engines); this pins that
agg_cms_heavy_hitters' w=32/d=3 actually produces BOTH estimate
classes — all-rows-collided (overcount > 0) and clean-row
(overcount = 0) — plus the one-sided law. (The round's other staged
operator ships unregistered — fresh7f's pipe_weighted_sample already
covers the A-ES surface; its laws live in tests/test_sampling.py.)"""

from __future__ import annotations

from mapreduce_system_spark import caches
from mapreduce_system_spark.registry import QUERIES
from tests.conftest import SF_DIR_MID


def test_cms_audit_exercises_both_estimate_classes(spark):
    try:
        rows = QUERIES["agg_cms_heavy_hitters"](spark, SF_DIR_MID).collect()
        assert len(rows) == 31  # the fixture vocabulary
        for r in rows:
            assert r.overcount >= 0, (r.token, r.overcount)  # one-sided
            assert r.est_cnt == r.exact_cnt + r.overcount
            assert r.exact_cnt >= 1
        n_collided = sum(1 for r in rows if r.overcount > 0)
        # data-chosen constants: the md5 cell map at w=32/d=3 collides
        # exactly 9 of 31 tokens on ALL d rows (count-independent — the
        # map is a pure function of the token strings)
        assert n_collided == 9, n_collided
    finally:
        caches.release()


def test_cms_constants_hold_at_sf01_too(spark):
    """VERDICT r16 #8: the registered w=32/d=3 were chosen on the
    sf0.01 gate fixture; guard against a fixture regeneration silently
    collapsing the collided class at the BENCH scale. The md5 cell map
    is a pure function of the token strings, and both fixtures carry
    the same 31-token vocabulary — so both estimate classes (all-rows
    collided: overcount > 0; at-least-one-clean-row: overcount = 0)
    must occur at sf0.1 exactly as at the gate scale."""
    try:
        rows = QUERIES["agg_cms_heavy_hitters"](spark, "/root/testdata/sf0.1").collect()
        assert len(rows) == 31
        for r in rows:
            assert r.overcount >= 0 and r.est_cnt == r.exact_cnt + r.overcount
        n_collided = sum(1 for r in rows if r.overcount > 0)
        assert n_collided == 9, n_collided
        assert sum(1 for r in rows if r.overcount == 0) == 22
    finally:
        caches.release()
