"""Birth tests for the fresh17 registrations (r17, staged r16): the
registered-surface invariants. Value parity is the driver's job
(tools/verify_local.py runs both engines); these pin the shapes the
operators' staging tests (test_blocking.py, test_lm.py) cannot see —
the registered key/window/discount constants over the real fixture.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mapreduce_system_spark import caches
from mapreduce_system_spark.functions.text import tokens
from mapreduce_system_spark.queries._textshared import _docs
from mapreduce_system_spark.registry import QUERIES
from tests.conftest import SF_DIR_MID


def test_sorted_neighborhood_volume_and_order_laws(spark):
    try:
        rows = QUERIES["dedup_sorted_neighborhood"](spark, SF_DIR_MID).collect()
        n = (
            _docs(spark, SF_DIR_MID, ["text"])
            .where(F.col("text").isNotNull())
            .count()
        )
        window = 4
        # exact linear candidate volume: n*(w-1) minus the truncated tail
        assert len(rows) == n * (window - 1) - (window - 1) * window // 2
        per_pos = Counter()
        for r in rows:
            assert 1 <= r.pos_b - r.pos_a < window, (r.pos_a, r.pos_b)
            assert 0 <= r.pos_a < n and 0 < r.pos_b < n
            assert r.id_a != r.id_b
            per_pos[r.pos_a] += 1
        # every non-tail position fans out to exactly window-1 successors
        assert all(c <= window - 1 for c in per_pos.values())
        assert sum(1 for c in per_pos.values() if c == window - 1) == n - window + 1
    finally:
        caches.release()


def test_kneser_ney_scores_cover_corpus_transitions(spark):
    try:
        rows = QUERIES["txt_kneser_ney_surprisal"](spark, SF_DIR_MID).collect()
        docs = _docs(spark, SF_DIR_MID, ["doc_id", "text"]).select(
            "doc_id", F.size(tokens("text")).alias("n_toks")
        )
        want = {
            r.doc_id: r.n_toks - 1 for r in docs.collect() if r.n_toks >= 2
        }
        assert {r.doc_id for r in rows} == set(want)
        for r in rows:
            # every adjacent pair of a scored doc is a transition
            assert r.n_transitions == want[r.doc_id], r.doc_id
            # -ln of a probability in (0, 1]: never negative, and the
            # discount guarantees no seen bigram reaches p == 1 exactly
            # unless it owns its whole context AND all continuation mass
            assert r.kn_surprisal >= 0.0, r.doc_id
    finally:
        caches.release()
