"""Round-7 additions, round-8-changed trio (the unchanged pair lives in
``fresh7b2`` — split so window slots track changed code, see
``queries/__init__``).

The reference's surface ends at map/shuffle/reduce over opaque strings
(worker.go:51,104,161-165); everything here is north-star extension
surface (BASELINE.json:6 — the LLM-data-pipeline mandate), each built
from JVM-side built-ins with a DuckDB ANSI-SQL twin:

- ``txt_bm25_topk`` — BM25 retrieval over the documents table for a
  static query set: tf / df / doc-length statistics via three hash
  aggregations, scoring via a broadcast join of the (tiny) term list
  against the tf table, top-k per query via a per-query window.
  Nothing doc x doc; the corpus is scanned once.
- ``txt_unigram_surprisal`` — unigram-LM surprisal per document (mean
  -ln p(token)), the classic cheap perplexity proxy used for corpus
  quality filtering. The LM is the corpus's own unigram distribution:
  one token-count aggregation joined back to the token stream (no
  forced broadcast — AQE sizes the join), then a per-doc mean.
- ``emb_int8_quantize_error`` — scalar int8 quantization of the
  embedding column: per-dimension global [min, max] (one aggregation,
  64 rows), codes = floor(255 * normalized + 0.5), then per-label mean
  reconstruction MSE. The distributive shape (posexplode → per-dim
  stats → broadcast join back) never materializes per-vector state on
  the driver, unlike codebook methods that collect centroids.

Float discipline (registry.py conventions): every FLOAT is cast to
DOUBLE before arithmetic on BOTH engines, formulas are parenthesized
identically, and outputs are rounded; guards avoid division by zero on
constant dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.functions.text import tokens
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# txt_bm25_topk — BM25 retrieval for a static query set
# ---------------------------------------------------------------------------

# Constants live in the non-registering _bm25shared module (r14: fresh11's
# txt_rrf_fusion interpolates the same query set into its fused oracle;
# a top-level cross-import of THIS module would re-seat its @register
# calls in the driver window). Local underscore aliases keep this file's
# SQL/docstrings unchanged.
from mapreduce_system_spark.queries._bm25shared import (
    BM25_B as _BM25_B,
    BM25_K1 as _BM25_K1,
    BM25_TOPK as _BM25_TOPK,
    BM25_VALUES as _BM25_VALUES,
    bm25_chain,
)

_BM25_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS word
  FROM documents
),
tok AS (SELECT doc_id, word FROM toks WHERE word <> ''),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dlen FROM tok GROUP BY 1),
corpus AS (SELECT avg(dlen) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM dl),
tf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
q(query, word) AS (SELECT * FROM (VALUES {_BM25_VALUES})),
scored AS (
  SELECT q.query, tf.doc_id,
         sum(
           ln(1 + (c.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({_BM25_K1} + 1))
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dlen / c.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (word)
  JOIN df USING (word)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY 1, 2
)
SELECT query, doc_id, rank, score
FROM (
  SELECT query, doc_id,
         row_number() OVER (PARTITION BY query ORDER BY score DESC, doc_id) AS rank,
         round(score, 4) AS score
  FROM scored
)
WHERE rank <= {_BM25_TOPK}
ORDER BY query, rank
"""


@register("txt_bm25_topk", _BM25_SQL)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query under BM25 (k1=1.2, b=0.75).

    One tokenize pass feeds three aggregations (doc length, tf, df);
    the query list is broadcast into the tf table, so scoring touches
    only postings of query terms — the per-query window ranks a
    candidate set bounded by df, never the corpus. The idf/tf-norm
    formula is written with identical parenthesization to the oracle
    so double math agrees to the rounded 4 decimals."""
    # the chain itself lives in _bm25shared.bm25_chain (r18): moved
    # verbatim so txt_rrf_fusion can reuse the tf postings table —
    # same expressions, same float discipline, same plan shape here
    ranked, _tf = bm25_chain(spark, sf_dir)
    return ranked


# ---------------------------------------------------------------------------
# txt_unigram_surprisal — unigram-LM quality scoring per document
# ---------------------------------------------------------------------------

_SURPRISAL_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS word
  FROM documents
),
tok AS (SELECT doc_id, word FROM toks WHERE word <> ''),
lm AS (SELECT word, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY 1),
total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(lm.cnt / t.n)), 4) AS surprisal
FROM tok
JOIN lm USING (word)
CROSS JOIN total t
GROUP BY tok.doc_id
ORDER BY tok.doc_id
"""


@register("txt_unigram_surprisal", _SURPRISAL_SQL)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram surprisal (-ln p) per document — the cheap perplexity
    proxy used to quality-filter training corpora (high surprisal =
    unusual token mix; log-perplexity = this value exactly).

    The LM is the corpus's own unigram distribution: one token-count
    aggregation produces a vocab-sized table joined back onto the token
    stream, then a per-doc mean. The LM join carries NO broadcast hint:
    the unigram vocabulary of a noisy web corpus (typos, ids, numerals
    under \\W+ tokenization) is not broadcast-sized, so AQE picks the
    strategy from the actual build-side size — broadcast at test scale,
    shuffled hash join on ``word`` (map-side combine already done by the
    LM aggregation) at corpus scale."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    lm = tok.groupBy("word").agg(F.count("*").cast("double").alias("cnt"))
    total = tok.agg(F.count("*").cast("double").alias("n"))
    return (
        tok.join(lm, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("cnt") / F.col("n"))), 4).alias("surprisal"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# emb_int8_quantize_error — scalar int8 embedding quantization + error audit
# ---------------------------------------------------------------------------

_INT8_SQL = """
WITH comp AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
stats AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM comp GROUP BY 1),
deq AS (
  SELECT c.vec_id, c.label,
         CASE WHEN s.mx > s.mn
              THEN s.mn + floor((c.v - s.mn) / (s.mx - s.mn) * 255 + 0.5) * (s.mx - s.mn) / 255
              ELSE c.v
         END AS vq,
         c.v
  FROM comp c JOIN stats s ON s.pos = c.pos
),
per_vec AS (
  SELECT vec_id, label, avg((v - vq) * (v - vq)) AS mse
  FROM deq GROUP BY 1, 2
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(mse) * 1000000, 3) AS mse_ppm
FROM per_vec
GROUP BY label
ORDER BY label
"""


@register("emb_int8_quantize_error", _INT8_SQL)
def q_int8_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column, audited as mean
    reconstruction MSE per label (reported in ppm — parts-per-million of
    squared distance — so the rounded output carries signal).

    Codes are floor(255 * (v - mn) / (mx - mn) + 0.5) against per-
    dimension GLOBAL [mn, mx] — the standard 4x-compression step before
    shipping embeddings to an ANN index. Distributive shape: posexplode
    → 64-row per-dimension stats → broadcast join back → per-vector then
    per-label means. No driver-side state at any corpus size (contrast
    codebook quantizers, which collect centroids — see
    operators/clustering.py). Constant dimensions (mx == mn) pass
    through unquantized on both engines."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    comp = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "vf"),
    ).select("vec_id", "label", "pos", F.col("vf").cast("double").alias("v"))
    stats = comp.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    mn, mx, v = F.col("mn"), F.col("mx"), F.col("v")
    vq = F.when(
        mx > mn,
        mn + F.floor((v - mn) / (mx - mn) * 255 + 0.5) * (mx - mn) / 255,
    ).otherwise(v)
    # MSE denominator is the observed per-vector dimension count (avg over
    # exploded components), not a hard-coded width: if the fixture's
    # embedding width ever changes, Spark and the oracle move together
    # (the oracle's generate_series bound is len(embedding) likewise).
    per_vec = (
        comp.join(F.broadcast(stats), "pos")
        .select("vec_id", "label", ((v - vq) * (v - vq)).alias("se"))
        .groupBy("vec_id", "label")
        .agg(F.avg("se").alias("mse"))
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("mse") * 1000000, 3).alias("mse_ppm"),
        )
        .orderBy("label")
    )
