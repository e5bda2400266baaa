"""TF-IDF cosine near-dup pairs (operators/dedup.py::tfidf_cosine_pairs)
— staged r13 for the r14 debut; the registered query will spell exactly
the oracle algebra drafted here (the cardinality/hll/lpa/boilerplate
staging pattern)."""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduce_system_spark.operators.dedup import tfidf_cosine_pairs

_DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha beta gamma delta"),            # exact duplicate of 0
    (2, "gamma delta epsilon zeta alpha"),    # heavy overlap with 0/1
    (3, "totally different words here"),      # disjoint
    (4, "alpha alpha alpha beta"),            # repeated-term weighting
    (5, ""),                                  # no tokens
    (6, None),                                # NULL text
    (7, "words reordered here different totally"),  # bag-equal to 3 + extra
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_exact_duplicates_score_one_and_order_free(spark):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(_df(spark), threshold=0.2).collect()
    }
    assert got[(0, 1)] == pytest.approx(1.0)
    assert all(a < b for a, b in got)
    # cosine is bag-based: reordering cannot lower a duplicate's score
    # (3 vs 7 share every one of 3's tokens)
    assert got[(3, 7)] > 0.8


def test_disjoint_and_empty_docs_produce_no_pair(spark):
    got = {
        (r.id_a, r.id_b)
        for r in tfidf_cosine_pairs(_df(spark), threshold=0.01).collect()
    }
    assert not any(3 in p and 0 in p for p in got)
    assert not any(5 in p or 6 in p for p in got)


def test_matches_independent_python_reference(spark):
    """Full parity against a from-scratch TF-IDF cosine in plain Python
    (no thresholding surprises: run at a tiny threshold and compare
    every pair)."""
    rows = [(i, t) for i, t in _DOCS]
    import re

    docs = {
        i: [w for w in re.split(r"\W+", (t or "").lower()) if w]
        for i, t in rows
    }
    n = len(rows)
    dfreq: dict[str, int] = {}
    for toks in docs.values():
        for w in set(toks):
            dfreq[w] = dfreq.get(w, 0) + 1
    weights = {}
    for i, toks in docs.items():
        tf: dict[str, int] = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        weights[i] = {
            w: c * (math.log((n + 1) / (dfreq[w] + 1)) + 1) for w, c in tf.items()
        }
    want = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = set(weights[a]) & set(weights[b])
            if not shared:
                continue
            dot = sum(weights[a][w] * weights[b][w] for w in shared)
            na = math.sqrt(sum(v * v for v in weights[a].values()))
            nb = math.sqrt(sum(v * v for v in weights[b].values()))
            c = round(dot / (na * nb), 6)
            if c >= 0.05:
                want[(a, b)] = c
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(_df(spark), threshold=0.05).collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=2e-6)


def test_df_cap_is_a_lower_bound_never_a_false_merge(spark):
    """Capping a ubiquitous token can only LOWER scores (norms keep all
    tokens; the intersection loses the capped term) — the jaccard_pairs
    cap contract, term-weighted."""
    rows = [
        (0, "common rare1 rare2"),
        (1, "common rare1 rare2"),
        (2, "common other thing"),
        (3, "common more words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(df, threshold=0.01).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(df, threshold=0.01, max_token_df=3).collect()
    }
    assert set(capped) <= set(full)
    for p, c in capped.items():
        assert c <= full[p] + 1e-9
    # pairs sharing ONLY the capped token vanish entirely
    assert (2, 3) in full and (2, 3) not in capped


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the r14 query will interpolate — tokenize via
    regexp_split_to_array + list filtering, tf/df/idf/norms/dot in SQL,
    both sides rounded to 6."""
    df = _df(spark)
    df.write.parquet(f"{tmp_path}/documents.parquet")
    got = sorted(
        map(tuple, tfidf_cosine_pairs(df, threshold=0.05).collect())
    )
    sql = f"""
WITH docs AS (
  SELECT doc_id, text FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
tok AS (
  SELECT doc_id AS id, unnest(list_filter(
           string_split_regex(lower(coalesce(text, '')), '\\W+'),
           x -> x <> '')) AS tok
  FROM docs
), tf AS (
  SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), w AS (
  SELECT id, tok, df,
         CAST(tf AS DOUBLE) * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w
  FROM tf JOIN dfreq USING (tok) CROSS JOIN nd
), norms AS (
  SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id
), dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.id = id_a
JOIN norms nb ON nb.id = id_b
WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.05
ORDER BY id_a, id_b
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, cg), (_, _, cw) in zip(got, want):
        assert cg == pytest.approx(cw, abs=2e-6)
