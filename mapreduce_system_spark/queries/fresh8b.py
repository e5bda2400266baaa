r"""Round-8 additions (second batch): corpus-statistics operators.

Four information-theoretic / distributional text measures a training-
data pipeline runs to characterize and QA a corpus — all pure
DataFrame aggregation algebra (no UDFs), all with exact DuckDB twins:

- ``txt_kl_divergence`` — per-language KL divergence between the
  language's unigram distribution and the corpus-wide distribution:
  the standard domain-shift probe ("how unlike the corpus mix is this
  slice?"). Support of P is always inside support of Q (the corpus
  includes the slice), so no smoothing term is needed and the sum is
  exact.
- ``txt_entropy_quality`` — per-document character-level Shannon
  entropy, the classic cheap gibberish/boilerplate detector (low
  entropy = repeated characters/templates; high = encrypted/binary
  junk).
- ``txt_bigram_cond_entropy`` — per-language conditional entropy
  H(w2|w1) of the token bigram process; the corpus-level redundancy
  measure (lower = more predictable text).
- ``txt_zipf_slope`` — least-squares slope/intercept of the log-log
  rank-frequency curve over each language's top terms (Zipf's law
  fits natural text near slope -1; strong deviation flags synthetic
  or templated corpora). Uses the built-in ``regr_slope`` /
  ``regr_intercept`` aggregates on both engines.

Scale notes: every query is explode → hash-aggregate → (at most) one
vocabulary-keyed equi-join — no forced broadcasts (the r7 verdict's
lesson: vocabularies are not broadcast-sized at web scale; AQE picks
the join strategy from actual sizes), no windows over the token
stream, map-side combine everywhere. Float discipline per registry.py:
cast to DOUBLE before arithmetic, identical parenthesization both
sides, rounded outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.functions.text import tokens
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# txt_kl_divergence — per-language vs corpus unigram KL
# ---------------------------------------------------------------------------

_KL_SQL = r"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(text), '\W+')) AS word
  FROM documents
),
tok AS (SELECT lang, word FROM toks WHERE word <> ''),
lw AS (SELECT lang, word, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY 1, 2),
nl AS (SELECT lang, sum(cnt) AS n_l FROM lw GROUP BY 1),
q AS (SELECT word, sum(cnt) AS wcnt FROM lw GROUP BY 1),
nn AS (SELECT sum(cnt) AS n FROM lw)
SELECT lw.lang,
       CAST(sum(lw.cnt) AS BIGINT) AS n_tokens,
       round(sum((lw.cnt / nl.n_l) * ln((lw.cnt / nl.n_l) / (q.wcnt / nn.n))), 6) AS kl_nats
FROM lw
JOIN nl USING (lang)
JOIN q USING (word)
CROSS JOIN nn
GROUP BY lw.lang
ORDER BY lw.lang
"""


@register("txt_kl_divergence", _KL_SQL)
def q_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(language unigram dist ‖ corpus unigram dist) per language, in
    nats — the domain-divergence score used to weight or flag corpus
    slices. One tokenize pass; the (lang, word) aggregate is the only
    token-stream shuffle and everything else derives from it; the
    vocabulary-keyed join back to the corpus distribution carries no
    broadcast hint (AQE sizes it)."""
    docs = load_table(spark, sf_dir, "documents", columns=["lang", "text"])
    tok = docs.select("lang", F.explode(tokens("text")).alias("word"))
    lw = tok.groupBy("lang", "word").agg(F.count("*").cast("double").alias("cnt"))
    nl = lw.groupBy("lang").agg(F.sum("cnt").alias("n_l"))
    q = lw.groupBy("word").agg(F.sum("cnt").alias("wcnt"))
    nn = lw.agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n_l")
    qq = F.col("wcnt") / F.col("n")
    return (
        lw.join(F.broadcast(nl), "lang")  # one row per language — truly tiny
        .join(q, "word")                  # vocab-sized: no hint, AQE decides
        .crossJoin(F.broadcast(nn))
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / qq)), 6).alias("kl_nats"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# txt_entropy_quality — per-document character entropy
# ---------------------------------------------------------------------------

_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, c
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
  WHERE c <> ''
),
cc AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS cnt FROM ch GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(cnt) AS len FROM cc GROUP BY 1)
SELECT cc.doc_id,
       CAST(dl.len AS BIGINT) AS n_chars,
       round(sum(-((cc.cnt / dl.len) * ln(cc.cnt / dl.len))), 4) AS entropy_nats
FROM cc JOIN dl USING (doc_id)
GROUP BY cc.doc_id, dl.len
ORDER BY cc.doc_id
"""


@register("txt_entropy_quality", _ENTROPY_SQL)
def q_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy (nats) per document — the cheap
    quality screen that catches repeated-character spam (entropy → 0)
    and non-text payloads (entropy → log alphabet). Explode → two hash
    aggregations + one doc-keyed join; linear in corpus characters,
    nothing vocabulary- or corpus-global at all."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    ch = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).where(F.col("c") != "")
    cc = ch.groupBy("doc_id", "c").agg(F.count("*").cast("double").alias("cnt"))
    dl = cc.groupBy("doc_id").agg(F.sum("cnt").alias("len"))
    p = F.col("cnt") / F.col("len")
    return (
        cc.join(dl, "doc_id")
        .groupBy("doc_id", "len")
        .agg(F.round(F.sum(-(p * F.log(p))), 4).alias("entropy_nats"))
        .select(
            "doc_id",
            F.col("len").cast("long").alias("n_chars"),
            "entropy_nats",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# txt_bigram_cond_entropy — per-language H(w2 | w1)
# ---------------------------------------------------------------------------

_BIGRAM_H_SQL = r"""
WITH toks AS (
  SELECT lang,
         list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS ts
  FROM documents
),
bg AS (
  SELECT lang, b[1] AS w1, b[2] AS w2
  FROM (SELECT lang, unnest([[ts[i], ts[i+1]] for i in range(1, len(ts))]) AS b
        FROM toks WHERE len(ts) >= 2)
),
c12 AS (SELECT lang, w1, w2, CAST(count(*) AS DOUBLE) AS c FROM bg GROUP BY 1, 2, 3),
c1 AS (SELECT lang, w1, sum(c) AS c1 FROM c12 GROUP BY 1, 2),
tt AS (SELECT lang, sum(c) AS t FROM c12 GROUP BY 1)
SELECT c12.lang,
       CAST(tt.t AS BIGINT) AS n_bigrams,
       round(sum((c12.c / tt.t) * (-ln(c12.c / c1.c1))), 6) AS cond_entropy_nats
FROM c12
JOIN c1 USING (lang, w1)
JOIN tt USING (lang)
GROUP BY c12.lang, tt.t
ORDER BY c12.lang
"""


@register("txt_bigram_cond_entropy", _BIGRAM_H_SQL)
def q_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(w2|w1) of each language's token bigram
    process, in nats: sum over bigrams of p(w1,w2) · −ln p(w2|w1),
    with p(w2|w1) = c(w1,w2)/c(w1·). The redundancy/predictability
    measure of the corpus. Bigrams come from one arrays_zip of the
    token array against its own tail (no self-join of the token
    stream); the context-count join is vocabulary-keyed — no hint."""
    docs = load_table(spark, sf_dir, "documents", columns=["lang", "text"])
    ts = docs.select("lang", tokens("text").alias("ts")).where(F.size("ts") >= 2)
    bg = ts.select(
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1),
                F.slice("ts", 2, F.size("ts") - 1),
            )
        ).alias("b"),
    ).select("lang", F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
    c12 = bg.groupBy("lang", "w1", "w2").agg(F.count("*").cast("double").alias("c"))
    c1 = c12.groupBy("lang", "w1").agg(F.sum("c").alias("c1"))
    tt = c12.groupBy("lang").agg(F.sum("c").alias("t"))
    return (
        c12.join(c1, ["lang", "w1"])  # vocab-keyed: AQE decides
        .join(F.broadcast(tt), "lang")
        .groupBy("lang", "t")
        .agg(
            F.round(
                F.sum((F.col("c") / F.col("t")) * (-F.log(F.col("c") / F.col("c1")))), 6
            ).alias("cond_entropy_nats")
        )
        .select(
            "lang",
            F.col("t").cast("long").alias("n_bigrams"),
            "cond_entropy_nats",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# txt_zipf_slope — log-log rank-frequency fit per language
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200

_ZIPF_SQL = rf"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(text), '\W+')) AS word
  FROM documents
),
tok AS (SELECT lang, word FROM toks WHERE word <> ''),
wc AS (SELECT lang, word, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rank
  FROM wc
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(cnt), ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope,
       round(regr_intercept(ln(cnt), ln(CAST(rank AS DOUBLE))), 4) AS zipf_intercept
FROM ranked
WHERE rank <= {_ZIPF_TOP}
GROUP BY lang
ORDER BY lang
"""


@register("txt_zipf_slope", _ZIPF_SQL)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: least-squares slope and intercept of
    ln(frequency) against ln(rank) over the top-{200} terms. Natural
    text sits near slope −1; strong deviation flags templated or
    synthetic slices. The per-language top-k window ranks the (already
    aggregated) vocabulary, not the token stream, and the regression is
    the built-in regr_slope aggregate — partial+final, no collect."""
    docs = load_table(spark, sf_dir, "documents", columns=["lang", "text"])
    tok = docs.select("lang", F.explode(tokens("text")).alias("word"))
    wc = tok.groupBy("lang", "word").agg(F.count("*").cast("double").alias("cnt"))
    win = W.partitionBy("lang").orderBy(F.desc("cnt"), "word")
    ranked = wc.select(
        "lang", "cnt", F.row_number().over(win).alias("rank")
    ).where(F.col("rank") <= _ZIPF_TOP)
    lncnt = F.log("cnt")
    lnrank = F.log(F.col("rank").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.regr_slope(lncnt, lnrank), 4).alias("zipf_slope"),
            F.round(F.regr_intercept(lncnt, lnrank), 4).alias("zipf_intercept"),
        )
        .orderBy("lang")
    )
