"""Round-13 registrations for the r14 window lead (the stage-in-N,
wire-in-N+1 pattern — graphml2's r12 shape, VERDICT r12's endorsed
debut discipline): three surfaces whose OPERATOR halves landed this
round with pytest-pinned cross-engine parity and drafted oracles
(tests/test_lpa.py, tests/test_boilerplate.py, tests/test_tfidf_pairs.py).
Registering them now, PAST the r13 window (which the rotation debt +
the five fresh9 debuts consume exactly), hands them the r14 window's
lead slots for their first driver rows.

- ``graph_label_propagation`` — synchronous community detection with
  the deterministic smallest-label tie-break over the part co-purchase
  graph (the same graph ``graph_triangle_count`` censuses — triangles
  describe its shape, LPA names its communities). Oracle: the unrolled
  per-round CTE (count per neighbor label → row_number argmax by count
  DESC, label ASC), exactly the algebra tests/test_lpa.py proved.
- ``pipe_strip_boilerplate`` — CCNet-style per-source line-frequency
  stripping. The fixture's documents are single-block texts, so the
  query STAGES the condition deterministically (both engines spell the
  same concat): a per-source banner line on every doc and a footer on
  every even doc_id, then strips at ratio 0.5 — the banner and footer
  must come back out, the payload must survive byte-exactly, in order.
- ``dedup_tfidf_cosine_pairs`` — the sparse similarity join: TF-IDF
  weighted cosine over the token inverted index, DF-capped with the
  jaccard family's documented lower-bound semantics.

Scale posture: LPA inherits pagerank's iteration audit (per-round one
equi-join + one map-side-combinable argmax aggregate, localCheckpoint +
block release); boilerplate's only corpus-sized shuffles are one
explode-aggregate and one anti-join on (source, line); the TF-IDF join
is inverted-index candidates (never all-pairs) with the DF cap bounding
the worst token's fan-out at cap² (10x probe: ``--tfidf`` mode,
tools/scale_probe.py).

Reference contrast: worker.go:104-165's one-shot map→reduce can count
neighbor labels, line frequencies, or postings — each is word count in
disguise — but cannot feed labels back for another round, join the
frequency relation against positional lines, or normalize a pair dot
by two per-doc aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.boilerplate import strip_boilerplate_lines
from mapreduce_system_spark.operators.dedup import tfidf_cosine_pairs
from mapreduce_system_spark.operators.graph import label_propagation
from mapreduce_system_spark.queries._graphshared import copurchase_pairs
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_LPA_ITERATIONS = 3


def _lpa_iter_cte(prev: str, cur: str) -> str:
    """One unrolled synchronous-LPA round (tests/test_lpa.py's draft,
    verbatim): per-node neighbor-label counts, argmax by count DESC then
    label ASC — the deterministic tie-break that makes the recurrence a
    pure function of the edge set."""
    return f"""{cur} AS (
  SELECT node, lbl AS label FROM (
    SELECT s.v AS node, l.label AS lbl,
           row_number() OVER (
             PARTITION BY s.v ORDER BY count(*) DESC, l.label ASC
           ) AS rn
    FROM sym s JOIN {prev} l ON l.node = s.u
    GROUP BY s.v, l.label
  ) WHERE rn = 1
)"""


_LPA_SQL = (
    """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
sym AS (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
"""
    + ",\n".join(
        _lpa_iter_cte(f"l{i}", f"l{i + 1}") for i in range(_LPA_ITERATIONS)
    )
    + f"""
SELECT node AS part, label AS community FROM l{_LPA_ITERATIONS}
ORDER BY part
"""
)


@register("graph_label_propagation", _LPA_SQL)
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous label-propagation communities of the part
    co-purchase graph: every part starts as its own label and adopts its
    neighbors' majority label (smallest on ties) each round — the
    community census of the graph whose triangles
    ``graph_triangle_count`` counts. Unlike connected components (one
    label per connected REGION) dense neighborhoods keep distinct
    majority labels."""
    pr = copurchase_pairs(spark, sf_dir)
    # copurchase_pairs guarantees DISTINCT u<v pairs, no self-loops —
    # the flag skips the operator's symmetrize-distinct exchange (one
    # full-edge-list shuffle saved before the iteration cache)
    out = label_propagation(
        pr, src="u", dst="v", iterations=_LPA_ITERATIONS,
        edges_undirected_distinct=True,
    )
    return out.select(
        F.col("node").alias("part"), F.col("label").alias("community")
    ).orderBy("part")


# ---------------------------------------------------------------------------
# pipe_strip_boilerplate — template-line removal, condition staged
# ---------------------------------------------------------------------------

_RATIO = 0.5

# Both engines stage the identical corpus: banner on every doc of a
# source (ratio 1.0 → stripped), footer on even doc_ids (~0.5 ≥ 0.5 →
# stripped), payload = the fixture text between them.
_STRIP_SQL = f"""
WITH staged AS (
  SELECT doc_id, source,
         'SRC ' || source || ' NEWSLETTER' || chr(10) || coalesce(text, '')
           || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Unsubscribe anytime'
                   ELSE '' END AS text
  FROM documents
  -- mirrors the operator's NULL-id drop (boilerplate.py: NULL ids cannot
  -- anchor reassembly); without it a NULL doc_id would appear in the
  -- DuckDB result and inflate per-source nd (ADVICE r13)
  WHERE doc_id IS NOT NULL
), d AS (
  -- coalesce mirrors the operator's NULL-text-as-'' contract; without it
  -- a NULL source NULLs the staged concat, string_split(NULL) unnests to
  -- zero lines, and the doc would vanish from tot (r13 review)
  SELECT doc_id, source, string_split(coalesce(text, ''), chr(10)) AS ls
  FROM staged
), l AS (
  SELECT doc_id, source, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
  FROM d
), nd AS (
  SELECT source, CAST(count(*) AS BIGINT) AS nd FROM d GROUP BY source
), bp AS (
  -- null-safe source equality: a NULL source is a real group (operator
  -- contract; plain = would exempt the NULL-source cohort)
  SELECT l.source, trim(l.line) AS key
  FROM l JOIN nd ON l.source IS NOT DISTINCT FROM nd.source
  WHERE trim(l.line) <> ''
  GROUP BY l.source, trim(l.line), nd.nd
  HAVING count(DISTINCT l.doc_id) >= 2
     AND CAST(count(DISTINCT l.doc_id) AS DOUBLE) >= {_RATIO} * nd.nd
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
SELECT d.doc_id, d.source,
       coalesce(a.clean_text, '') AS clean_text,
       t.n_lines,
       t.n_lines - coalesce(a.n_kept, 0) AS n_removed
FROM d JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


@register("pipe_strip_boilerplate", _STRIP_SQL)
def q_pipe_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-line stripping over a deterministically
    templated corpus: a banner line rides every doc of a source and a
    footer rides the even doc_ids; at ratio 0.5 both are template
    (stripped) while each doc's fixture payload survives byte-exactly
    and in order. The CCNet-style cleanup a curation pipeline runs
    before dedup — template lines would otherwise dominate every
    shingle/posting frequency downstream."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "text"])
    staged = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("SRC "),
            F.col("source"),
            F.lit(" NEWSLETTER\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 2 == 0, F.lit("\nUnsubscribe anytime")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    out = strip_boilerplate_lines(
        staged, min_doc_ratio=_RATIO, min_docs=2
    )
    return out.select(
        F.col("id").alias("doc_id"), "source", "clean_text", "n_lines", "n_removed"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup_tfidf_cosine_pairs — the sparse similarity join
# ---------------------------------------------------------------------------

_COS_THRESHOLD = 0.25
# Token-DF cap, measured against the fixture (r13 sweep): the synthetic
# corpus's TEMPLATE tokens sit at df in (250, 500] of sf0.01's 500 docs —
# capped at 200 they are all discounted and the output is the genuinely
#-rare-term tail (12 pairs at sf0.01); at 500+ the template vocabulary
# floods back and half of all C(500,2) pairs "match" (~116k rows — a
# boilerplate artifact, exactly what the cap exists to suppress).
_MAX_TOKEN_DF = 200

_TFIDF_PAIRS_SQL = f"""
WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
tok AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS tok
  FROM documents
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
  WHERE a.df <= {_MAX_TOKEN_DF} AND b.df <= {_MAX_TOKEN_DF}
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.id = id_a
JOIN norms nb ON nb.id = id_b
WHERE round(dot / (na.nrm * nb.nrm), 6) >= {_COS_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("dedup_tfidf_cosine_pairs", _TFIDF_PAIRS_SQL)
def q_dedup_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted cosine near-dup pairs via the token inverted
    index — WEIGHTED bag similarity (rare shared terms dominate,
    boilerplate discounts itself) where ``dedup_jaccard_pairs`` scores
    raw shingle overlap; cosine is reorder-immune where shingles are
    not. Norms keep ALL tokens while the DF cap prunes only the
    intersection — the documented lower-bound contract shared with the
    jaccard family."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_cosine_pairs(
        docs,
        threshold=_COS_THRESHOLD,
        max_token_df=_MAX_TOKEN_DF,
        round_to=6,
    ).orderBy("id_a", "id_b")
