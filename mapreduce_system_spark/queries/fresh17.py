"""Round-17 registrations: the two operators STAGED r16 with tests +
drafted oracles + probe records (the wire-in-N+1 staging pattern —
fresh12/fresh13/fresh14 precedent), registered past the r17 window for
an r18 window-lead debut, exactly as VERDICT r16 #2/#3 prescribe.

- ``dedup_sorted_neighborhood`` — sorted-neighborhood blocking
  (operators/blocking.py, Hernandez & Stolfo 1995): candidate pairs
  over the shared content-normalization's 24-char prefix key on
  documents, with the exact-duplicate fingerprint verdict as the audit
  column. This is the ORDER-based candidate generator the
  content-blocking dedup family (MinHash bands, SimHash chunks, TF-IDF
  postings, edit-distance prefixes) lacks: key-ADJACENT records pair
  even with zero shared tokens/shingles. The Spark side never plans a
  single-partition window — range exchange + per-partition rank +
  broadcast offset stitch + banded equi-join (linear n*(window-1)
  candidates); the oracle CAN afford the textbook one-window spelling,
  which is exactly why it is the oracle. Probe:
  bench_runs/scale_probe_r16_sneighbor.json (pair census exactly x10
  at 10x corpus, wall x1.19). Reference contrast: worker.go:16-21,153
  sorts within ONE reduce partition; the global-position offset stitch
  is the distributed piece the one-shot pipeline cannot express.

- ``txt_kneser_ney_surprisal`` — interpolated Kneser-Ney bigram
  scoring (operators/lm.py, Chen & Goodman 1999's form, D=0.75): the
  smoothed LM score the registered add-one surprisal queries
  approximate and the score CCNet-style corpus filters actually rank
  by. Every model input is an exact integer aggregate of the corpus
  bigram table; both engines compose the same division/ln with
  identical parenthesization, so the full-value oracle holds after the
  output rounding (the txt_*_surprisal discipline, round 4). Probe:
  bench_runs/scale_probe_r16_knlm.json (disjoint token-salted shards:
  per-shard scores identical across scales). Reference contrast:
  worker.go:104-165 can produce any ONE of the five count tables; the
  score joins a reducer's output against four other reducers' outputs
  keyed by its own components — a reduce-of-reduces the one-shot model
  cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions.text import (
    fingerprint,
    normalized_text,
    tokens,
)
from mapreduce_system_spark.operators.blocking import sorted_neighborhood_pairs
from mapreduce_system_spark.operators.lm import kneser_ney_doc_scores
from mapreduce_system_spark.queries._textshared import _TOKS, _docs
from mapreduce_system_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_sorted_neighborhood — ORDER-blocked candidate pairs + exact-dup audit
# ---------------------------------------------------------------------------

_SNB_WINDOW = 4   # each record pairs with its 3 successors: 3n candidates
_SNB_KEY_LEN = 24

# The key and the fingerprint both derive from functions.text's ONE shared
# normalization (normalized_text), spelled identically here — blocking and
# fingerprinting cannot silently desynchronize.
_SNB_NORM = r"trim(regexp_replace(lower(text), '\W+', ' ', 'g'))"

_SNB_SQL = rf"""
WITH keyed AS (
  SELECT doc_id,
         md5({_SNB_NORM}) AS fp,
         substr({_SNB_NORM}, 1, {_SNB_KEY_LEN}) AS key
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
pos AS (
  SELECT doc_id, fp, key,
         row_number() OVER (ORDER BY key, doc_id) - 1 AS pos
  FROM keyed
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(a.pos AS BIGINT) AS pos_a, CAST(b.pos AS BIGINT) AS pos_b,
       (a.fp = b.fp) AS exact_dup
FROM pos a JOIN pos b ON b.pos - a.pos >= 1 AND b.pos - a.pos < {_SNB_WINDOW}
ORDER BY id_a, id_b
"""


@register("dedup_sorted_neighborhood", _SNB_SQL)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs over the normalized 24-char
    prefix key, window=4 (linear 3n candidates), with the exact-dup
    fingerprint verdict per pair. The oracle's one-window/theta-join
    spelling is the textbook form this operator exists to avoid at
    scale: positions here come from the range-exchange offset stitch
    (no single-partition stage) and pairs from a banded equi-join on
    consecutive integer buckets (skew-impossible key). The fingerprint
    joins back by doc_id — two AQE-sized equi-joins, no broadcast
    hints needed for the audit column."""
    docs = _docs(spark, sf_dir, ["doc_id", "text"])
    keyed = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.substring(normalized_text("text"), 1, _SNB_KEY_LEN).alias("key"),
    )
    pairs = sorted_neighborhood_pairs(
        keyed, "doc_id", "key", window=_SNB_WINDOW
    )
    fa = keyed.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("_fp_a"))
    fb = keyed.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("_fp_b"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            "pos_a",
            "pos_b",
            (F.col("_fp_a") == F.col("_fp_b")).alias("exact_dup"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# txt_kneser_ney_surprisal — smoothed-LM document scores
# ---------------------------------------------------------------------------

_KN_D = 0.75  # Chen-Goodman default absolute discount

_KN_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
),
pairs AS (
  SELECT doc_id, b[1] AS w1, b[2] AS w2
  FROM (SELECT doc_id, unnest([[ts[i], ts[i+1]] for i in range(1, len(ts))]) AS b
        FROM toks WHERE len(ts) >= 2)
),
db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1, 2, 3),
bg AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_left FROM bg GROUP BY 1),
rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_right FROM bg GROUP BY 1),
alln AS (SELECT CAST(count(*) AS DOUBLE) AS n1p_all FROM bg),
probs AS (
  SELECT bg.w1, bg.w2,
         greatest(bg.c12 - {_KN_D}, 0.0) / lft.c1
         + ({_KN_D} * lft.n1p_left / lft.c1) * (rgt.n1p_right / alln.n1p_all)
           AS p_kn
  FROM bg JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN alln
)
SELECT db.doc_id,
       CAST(sum(db.cnt) AS BIGINT) AS n_transitions,
       round(sum(db.cnt * -ln(p.p_kn)) / sum(db.cnt), 4) AS kn_surprisal
FROM db JOIN probs p ON p.w1 = db.w1 AND p.w2 = db.w2
GROUP BY db.doc_id
ORDER BY db.doc_id
"""


@register("txt_kneser_ney_surprisal", _KN_SQL)
def q_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document transition-weighted mean -ln P_KN under the corpus's
    own interpolated Kneser-Ney bigram model (D=0.75): absolute-discount
    every seen bigram, route the freed mass to the CONTINUATION unigram
    (how many distinct contexts a word follows — the 'francisco'
    property add-one lacks). One tokenize pass; all five count tables
    re-aggregate the (doc, w1, w2, cnt) relation with map-side combine;
    joins back are bigram-/vocab-keyed with NO broadcast hints (AQE
    sizes them — web-scale vocabularies are not broadcast-sized). The
    corpus-total type count rides a one-row broadcast."""
    docs = _docs(spark, sf_dir, ["doc_id", "text"])
    scores = kneser_ney_doc_scores(docs, "doc_id", tokens("text"), discount=_KN_D)
    return scores.select(
        "doc_id",
        "n_transitions",
        F.round("kn_surprisal", 4).alias("kn_surprisal"),
    ).orderBy("doc_id")
