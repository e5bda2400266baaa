"""PMI collocations (operators/collocation.py) — staged r15 for an r16
debut (``txt_pmi_collocations`` planned); the registered query will
spell exactly the oracle drafted here. Parity is pinned against an
independent pure-Python reference AND the DuckDB draft, plus a fuzz
sweep over random token streams."""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduce_system_spark.operators.collocation import pmi_collocations
from tests.conftest import SF_DIR_MID

# DuckDB spelling of the repo tokenizer (functions/text.py::tokens) —
# the _TOKS constant textstats.py's oracles interpolate
_TOKS = r"list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"

_DOCS = [
    ("new york is big and new york is old",),
    ("york new is not new york",),
    ("machine learning beats machine guessing",),
    ("the the the the the",),
    ("one",),
    (None,),
    ("",),
]


def _ref_pmi(texts, min_count, top_k):
    import re

    uni: dict = {}
    bi: dict = {}
    nu = nb = 0
    for t in texts:
        if t is None:
            continue
        ts = [w for w in re.split(r"\W+", t.lower()) if w]
        nu += len(ts)
        nb += max(len(ts) - 1, 0)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
    rows = []
    for g, n_xy in bi.items():
        if n_xy < min_count:
            continue
        x, y = g.split(" ")
        pmi = math.log((n_xy / nb) / ((uni[x] / nu) * (uni[y] / nu)))
        rows.append((g, n_xy, pmi))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return [(g, n, round(p, 6)) for g, n, p in rows[:top_k]]


def test_pmi_matches_reference_handbuilt(spark):
    df = spark.createDataFrame(_DOCS, "text string")
    got = [
        (r.bigram, r.n_xy, r.pmi)
        for r in pmi_collocations(df, min_count=2, top_k=10).collect()
    ]
    want = _ref_pmi([t[0] for t in _DOCS], 2, 10)
    assert got == want
    # the association ranking's whole point: "new york" (tight pair)
    # outranks "the the" (frequent but predicted by its parts)
    names = [g for g, _, _ in got]
    assert names.index("new york") < names.index("the the")


def test_pmi_rejects_bad_params(spark):
    df = spark.createDataFrame(_DOCS, "text string")
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        pmi_collocations(df, top_k=0)


def test_pmi_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the r16 query will interpolate: unigram +
    adjacent-bigram multiset counts, floor, two unigram joins, one
    identically-parenthesized ln."""
    df = spark.createDataFrame(_DOCS, "text string")
    df.write.parquet(f"{tmp_path}/docs.parquet")
    got = [
        (r.bigram, r.n_xy, r.pmi)
        for r in pmi_collocations(df, min_count=2, top_k=10).collect()
    ]
    sql = f"""
WITH toks AS (
  SELECT {_TOKS} AS ts
  FROM read_parquet('{tmp_path}/docs.parquet/*.parquet')
), base AS (SELECT ts FROM toks WHERE len(ts) >= 1),
uni AS (SELECT unnest(ts) AS w FROM base),
uc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY w),
tot AS (
  SELECT CAST(sum(len(ts)) AS DOUBLE) AS nu,
         CAST(sum(greatest(len(ts) - 1, 0)) AS DOUBLE) AS nb
  FROM base
),
bi AS (
  SELECT unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS bigram
  FROM base WHERE len(ts) >= 2
),
bc AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS n_xy
  FROM bi GROUP BY bigram HAVING count(*) >= 2
),
j AS (
  SELECT b.bigram, b.n_xy, ux.n_w AS nx, uy.n_w AS ny, t.nu, t.nb
  FROM bc b
  JOIN uc ux ON ux.w = string_split(b.bigram, ' ')[1]
  JOIN uc uy ON uy.w = string_split(b.bigram, ' ')[2]
  CROSS JOIN tot t
),
scored AS (
  SELECT bigram, n_xy,
         ln((CAST(n_xy AS DOUBLE) / nb)
            / ((CAST(nx AS DOUBLE) / nu) * (CAST(ny AS DOUBLE) / nu))) AS pmi_raw
  FROM j
)
SELECT bigram, n_xy, round(pmi_raw, 6) AS pmi
FROM scored ORDER BY pmi_raw DESC, bigram LIMIT 10
"""
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == want


def test_pmi_fuzz_15_random_corpora(spark):
    """15 seeded random token streams (small vocab so collisions and
    floors are exercised) vs the pure-Python reference."""
    import random

    for g in range(15):
        rng = random.Random(9900 + g)
        vocab = [f"w{i}" for i in range(rng.randint(3, 8))]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(2, 8))
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            (r.bigram, r.n_xy, r.pmi)
            for r in pmi_collocations(df, min_count=2, top_k=15).collect()
        ]
        want = _ref_pmi(texts, 2, 15)
        assert got == want, f"seed {g}"
        from mapreduce_system_spark import caches

        caches.release()


def test_pmi_on_documents_fixture_sane(spark):
    """The planned registration's shape over the real fixture: every
    returned pair meets the floor, PMI finite, deterministic order."""
    from mapreduce_system_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_MID, "documents", columns=["text"])
    out = pmi_collocations(docs, min_count=5, top_k=20).collect()
    assert 0 < len(out) <= 20
    assert all(r.n_xy >= 5 and math.isfinite(r.pmi) for r in out)
    from mapreduce_system_spark import caches

    caches.release()
