"""Interpolated Kneser-Ney bigram scoring (operators/lm.py) — staged
r16 for an r17+ debut (``txt_kneser_ney_surprisal`` planned); the
registered query will spell the count-table oracle drafted here. Every
input is an exact integer aggregate, so parity is pinned against an
independent pure-Python reference AND a DuckDB draft, plus the two
laws the smoother exists for: per-context probability mass sums to 1,
and the continuation distribution demotes frequent-but-predictable
words (the "francisco" property) where add-one cannot."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import duckdb
import pytest

from pyspark.sql import functions as F

from mapreduce_system_spark.operators.lm import (
    doc_bigram_counts,
    kneser_ney_bigram_probs,
    kneser_ney_doc_scores,
)

_D = 0.75


def _ref_tables(docs):
    bg: Counter = Counter()
    per_doc: dict = defaultdict(Counter)
    for doc_id, toks in docs:
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            per_doc[doc_id][(a, b)] += 1
    c1: Counter = Counter()
    n1p_left: Counter = Counter()
    n1p_right: Counter = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        n1p_left[a] += 1
        n1p_right[b] += 1
    return bg, per_doc, c1, n1p_left, n1p_right, len(bg)


def _ref_pkn(bg, c1, n1p_left, n1p_right, n_all, a, b, d=_D):
    return max(bg[(a, b)] - d, 0.0) / c1[a] + (
        d * n1p_left[a] / c1[a]
    ) * (n1p_right[b] / n_all)


def _toks_col():
    return F.split(F.col("text"), " ")


def test_probs_match_reference_and_mass_law(spark):
    docs = [
        (1, "a b a b c".split()),
        (2, "b c b a a b".split()),
        (3, "c c a".split()),
    ]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    db = doc_bigram_counts(df, "doc_id", _toks_col())
    got = {
        (r.w1, r.w2): r.p_kn
        for r in kneser_ney_bigram_probs(db, discount=_D).collect()
    }
    bg, _, c1, nl, nr, n_all = _ref_tables(docs)
    assert set(got) == set(bg)
    for (a, b), p in got.items():
        assert p == pytest.approx(_ref_pkn(bg, c1, nl, nr, n_all, a, b), rel=1e-12)
    # mass law: sum over SEEN continuations + the backoff mass routed to
    # unseen ones must be 1 per context; over seen-only it is
    # 1 - (D * N1+(w1 *)/c(w1)) * (unseen continuation mass). With the
    # closed vocabulary here, check the seen-side sum against the
    # reference's own seen-side sum instead of an analytic 1.
    for a in c1:
        seen = sum(p for (x, _), p in got.items() if x == a)
        ref_seen = sum(
            _ref_pkn(bg, c1, nl, nr, n_all, a, b)
            for (x, b) in bg
            if x == a
        )
        assert seen == pytest.approx(ref_seen, rel=1e-12)


def test_full_mass_sums_to_one_over_vocabulary(spark):
    """The real normalization law: summing P_KN(w2|w1) over the WHOLE
    continuation vocabulary (seen and unseen w2 — the interpolated
    term applies to all) equals 1 for every context."""
    docs = [(1, "a b a c a d b c".split()), (2, "d a d b".split())]
    bg, _, c1, nl, nr, n_all = _ref_tables(docs)
    vocab = {w for (a, b) in bg for w in (a, b)}
    for a in c1:
        total = 0.0
        for b in vocab:
            if (a, b) in bg:
                total += _ref_pkn(bg, c1, nl, nr, n_all, a, b)
            else:
                total += (_D * nl[a] / c1[a]) * (nr[b] / n_all)
        assert total == pytest.approx(1.0, rel=1e-9), a


def test_doc_scores_match_reference(spark):
    rng = random.Random(1653)
    vocab = ["the", "san", "francisco", "cat", "sat", "mat", "dog"]
    docs = [
        (i, [rng.choice(vocab) for _ in range(rng.randint(2, 30))])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_transitions, r.kn_surprisal)
        for r in kneser_ney_doc_scores(df, "doc_id", _toks_col()).collect()
    }
    bg, per_doc, c1, nl, nr, n_all = _ref_tables(docs)
    for doc_id, toks in docs:
        n_tr = len(toks) - 1
        want = (
            sum(
                c * -math.log(_ref_pkn(bg, c1, nl, nr, n_all, a, b))
                for (a, b), c in per_doc[doc_id].items()
            )
            / n_tr
        )
        assert got[doc_id][0] == n_tr
        assert got[doc_id][1] == pytest.approx(want, rel=1e-12)


def test_continuation_demotes_francisco(spark):
    """The property add-one lacks: 'francisco' occurs often but only
    ever after 'san', so its CONTINUATION probability must be low —
    lower than an equally-frequent word seen after many contexts."""
    docs = [(i, "san francisco".split()) for i in range(10)] + [
        (100 + i, [c, "mat"]) for i, c in enumerate("abcdefghij")
    ]
    bg, _, c1, nl, nr, n_all = _ref_tables(docs)
    p_cont_francisco = nr["francisco"] / n_all
    p_cont_mat = nr["mat"] / n_all
    assert bg[("san", "francisco")] == 10 == sum(
        c for (a, b), c in bg.items() if b == "mat"
    )
    assert p_cont_francisco < p_cont_mat


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The count-table algebra the planned ``txt_kneser_ney_surprisal``
    will interpolate, end to end (per-doc scores, rounded)."""
    rng = random.Random(1654)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(f"{tmp_path}/docs.parquet")
    got = sorted(
        (r.doc_id, r.n_transitions, round(r.kn_surprisal, 9))
        for r in kneser_ney_doc_scores(df, "doc_id", _toks_col()).collect()
    )
    sql = f"""
WITH ts AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM read_parquet('{tmp_path}/docs.parquet/*.parquet')
),
pairs AS (
  SELECT doc_id, b[1] AS w1, b[2] AS w2
  FROM (SELECT doc_id, unnest([[t[i], t[i+1]] for i in range(1, len(t))]) AS b
        FROM ts WHERE len(t) >= 2)
),
db AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1,2,3),
bg AS (SELECT w1, w2, sum(cnt)::BIGINT AS c12 FROM db GROUP BY 1,2),
lft AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p_left FROM bg GROUP BY 1),
rgt AS (SELECT w2, count(*)::BIGINT AS n1p_right FROM bg GROUP BY 1),
alln AS (SELECT count(*)::DOUBLE AS n1p_all FROM bg),
probs AS (
  SELECT bg.w1, bg.w2,
         greatest(bg.c12 - {_D}, 0.0) / lft.c1
         + ({_D} * lft.n1p_left / lft.c1) * (rgt.n1p_right / alln.n1p_all)
           AS p_kn
  FROM bg JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN alln
)
SELECT db.doc_id,
       sum(db.cnt)::BIGINT AS n_transitions,
       round(sum(db.cnt * -ln(p.p_kn)) / sum(db.cnt), 9) AS kn_surprisal
FROM db JOIN probs p ON p.w1 = db.w1 AND p.w2 = db.w2
GROUP BY db.doc_id
ORDER BY db.doc_id
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == pytest.approx(w, abs=2e-9)


def test_rejects_bad_discount(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    db = doc_bigram_counts(df, "doc_id", _toks_col())
    for d in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError, match="discount"):
            kneser_ney_bigram_probs(db, discount=d)
