"""Boilerplate-line stripping (operators/boilerplate.py) — staged r13
for the r14 debut; the registered query will spell exactly the oracle
algebra drafted here (the cardinality/hll/lpa staging pattern)."""

from __future__ import annotations

import duckdb

from mapreduce_system_spark.operators.boilerplate import strip_boilerplate_lines

_BANNER = "ACCEPT COOKIES TO CONTINUE"
_FOOT = "© example corp"
_DOCS = [
    # source A: 4 docs, banner in 3/4 (ratio .75 ≥ .5 → strip), footer in
    # 2/4 (ratio .5 ≥ .5 → strip), unique bodies kept in order
    (0, "A", f"{_BANNER}\nalpha body one\n{_FOOT}"),
    (1, "A", f"{_BANNER}\nbeta body two\nmore beta"),
    (2, "A", f"gamma opens\n{_BANNER}\n{_FOOT}\ngamma closes"),
    (3, "A", "delta only unique\n\n  \ndelta end"),       # blank lines kept
    # source B: 2 docs; line repeated TWICE within one doc counts once
    # toward incidence (1/2 < min_docs=2 → kept)
    (4, "B", "dup line\ndup line\nb-four"),
    (5, "B", "b-five only"),
    # source C: single doc — min_docs=2 forbids self-stripping
    (6, "C", "lonely\nlonely"),
    # NULL text behaves as '' (own source so A's ratios stay 4-doc)
    (7, "D", None),
]


def _run(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, source string, text string")
    return {
        r.id: r
        for r in strip_boilerplate_lines(
            df, min_doc_ratio=0.5, min_docs=2
        ).collect()
    }


def test_strips_frequent_lines_preserving_order(spark):
    got = _run(spark)
    assert got[0].clean_text == "alpha body one"
    assert got[0].n_lines == 3 and got[0].n_removed == 2
    assert got[1].clean_text == "beta body two\nmore beta"
    assert got[2].clean_text == "gamma opens\ngamma closes"
    assert got[2].n_removed == 2


def test_whitespace_lines_and_null_text_are_structure(spark):
    got = _run(spark)
    # 5 docs in source A; blank/whitespace lines appear in several but
    # are never classified — doc 3 keeps all 4 of its lines
    assert got[3].clean_text == "delta only unique\n\n  \ndelta end"
    assert got[3].n_removed == 0
    assert got[7].clean_text == "" and got[7].n_lines == 1 and got[7].n_removed == 0


def test_within_doc_repeats_and_single_doc_sources_survive(spark):
    got = _run(spark)
    assert got[4].clean_text == "dup line\ndup line\nb-four"
    assert got[5].clean_text == "b-five only"
    assert got[6].clean_text == "lonely\nlonely" and got[6].n_removed == 0


def test_fully_stripped_doc_survives_as_empty(spark):
    df = spark.createDataFrame(
        [(0, "S", "x"), (1, "S", "x"), (2, "S", "x")],
        "doc_id long, source string, text string",
    )
    got = {
        r.id: r
        for r in strip_boilerplate_lines(df, min_doc_ratio=0.5, min_docs=2).collect()
    }
    assert all(r.clean_text == "" and r.n_removed == 1 for r in got.values())
    assert len(got) == 3


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the r14 query will interpolate: positional
    lines via zipped unnest + generate_subscripts, incidence via
    count(DISTINCT doc), reassembly via string_agg ORDER BY pos."""
    df = spark.createDataFrame(_DOCS, "doc_id long, source string, text string")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    got = sorted(
        map(
            tuple,
            strip_boilerplate_lines(df, min_doc_ratio=0.5, min_docs=2)
            .orderBy("id")
            .collect(),
        )
    )
    sql = f"""
WITH d AS (
  SELECT doc_id, source,
         string_split(coalesce(text, ''), chr(10)) AS ls
  FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')
  WHERE doc_id IS NOT NULL
), l AS (
  SELECT doc_id, source, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
  FROM d
), nd AS (
  SELECT source, CAST(count(*) AS BIGINT) AS nd FROM d GROUP BY source
), bp AS (
  SELECT l.source, trim(l.line) AS key
  FROM l JOIN nd ON l.source IS NOT DISTINCT FROM nd.source
  WHERE trim(l.line) <> ''
  GROUP BY l.source, trim(l.line), nd.nd
  HAVING count(DISTINCT l.doc_id) >= 2
     AND CAST(count(DISTINCT l.doc_id) AS DOUBLE) >= 0.5 * nd.nd
), kept AS (
  SELECT l.* FROM l
  LEFT JOIN bp ON bp.source IS NOT DISTINCT FROM l.source
             AND bp.key = trim(l.line)
  WHERE bp.key IS NULL
), agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM l GROUP BY doc_id
)
SELECT d.doc_id AS id, d.source,
       coalesce(a.clean_text, '') AS clean_text,
       t.n_lines,
       t.n_lines - coalesce(a.n_kept, 0) AS n_removed
FROM d JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY id
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_null_id_rows_dropped_and_null_source_is_a_real_group(spark):
    """r13 review pins: NULL-id docs are DROPPED (a NULL key cannot
    anchor reassembly — two would merge); a NULL SOURCE is a real group
    whose frequent lines STRIP (null-safe joins — plain equality would
    silently exempt the whole cohort)."""
    rows = [
        (None, "A", "ghost doc"),
        (0, None, "BANNER\nalpha"),
        (1, None, "BANNER\nbeta"),
        (2, None, "BANNER\ngamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.id: r
        for r in strip_boilerplate_lines(df, min_doc_ratio=0.5, min_docs=2).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0].clean_text == "alpha" and got[0].n_removed == 1
    assert got[1].clean_text == "beta" and got[2].clean_text == "gamma"
    assert all(r.source is None for r in got.values())


def test_tab_only_lines_are_content_not_structure(spark):
    """The classification key is the SPACE-trim (both engines trim ASCII
    spaces only): a tab-only separator line repeated across a source's
    docs is CONTENT with key '\\t' and strips like any template line,
    while space-only lines never classify."""
    rows = [
        (0, "S", "\t\nalpha\n   "),
        (1, "S", "\t\nbeta\n   "),
        (2, "S", "\t\ngamma\n   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.id: r
        for r in strip_boilerplate_lines(df, min_doc_ratio=0.5, min_docs=2).collect()
    }
    # the tab line strips (content key); the space-only trailer survives
    assert got[0].clean_text == "alpha\n   "
    assert got[0].n_removed == 1 and got[0].n_lines == 3
