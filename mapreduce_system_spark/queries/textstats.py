"""Registered text-analysis queries over the documents corpus.

Every Spark-side expression in ``functions.text`` was written to be
oracle-matchable; these queries prove it — the DuckDB SQL replicates the
token algebra (split/filter/ratio/CASE) step for step, and ratios are
rounded identically on both sides.

Scale notes: all of these are scan + per-row JVM expressions + one bounded
aggregation — the cheapest possible shapes. TF-IDF shuffles (doc,term)
pairs twice (df computation + join), both on the term key where partial
aggregation collapses zipfian skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.queries._textshared import (
    _STOPLIST,
    _TOKS,
    _docs,
    _marker_score_sql,
)
from mapreduce_system_spark.registry import register




_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w \t\n\x0B\f\r]', '', 'g')) AS n_punct,
         {_TOKS} AS ts
  FROM documents
), feat AS (
  SELECT doc_id,
         n_chars,
         len(ts) AS n_tokens,
         n_punct::DOUBLE / greatest(n_chars, 1) AS punct_ratio,
         len(list_filter(ts, t -> list_contains({_STOPLIST}, t)))::DOUBLE
           / greatest(len(ts), 1) AS stopword_ratio,
         CASE WHEN len(ts) > 0
              THEN list_sum(list_transform(ts, t -> length(t)))::DOUBLE / len(ts)
              ELSE 0.0 END AS mean_word_len
  FROM base
)
SELECT doc_id,
       n_chars,
       n_tokens,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(mean_word_len, 6) AS mean_word_len,
       round((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN stopword_ratio >= 0.01 THEN 1.0 ELSE 0.0 END
            + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) / 3.0, 6) AS quality
FROM feat
ORDER BY doc_id
"""


@register("txt_quality_profile", _QUALITY_SQL)
def q_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score — pure JVM column
    expressions, one scan, no shuffle (ordering aside)."""
    docs = _docs(spark, sf_dir, ["doc_id", "text"])
    feats = TXT.quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["mean_word_len"], 6).alias("mean_word_len"),
        F.round(TXT.quality_score("text"), 6).alias("quality"),
    ).orderBy("doc_id")




_LANG_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKS} AS ts FROM documents
), scores AS (
  SELECT doc_id, lang,
         {_marker_score_sql('en')} AS s_en,
         {_marker_score_sql('es')} AS s_es,
         {_marker_score_sql('de')} AS s_de,
         {_marker_score_sql('fr')} AS s_fr
  FROM toks
), pred AS (
  SELECT doc_id, lang,
         CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
              WHEN s_es > 0 AND s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
              WHEN s_de > 0 AND s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
              WHEN s_fr > 0 AND s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
              ELSE 'und' END AS predicted
  FROM scores
)
SELECT lang, predicted, count(*) AS cnt
FROM pred
GROUP BY lang, predicted
ORDER BY lang, predicted
"""


@register("txt_lang_confusion", _LANG_SQL)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID confusion matrix against the corpus's labeled
    lang column (marker-word argmax with fixed tie order)."""
    docs = _docs(spark, sf_dir, ["doc_id", "text", "lang"])
    return (
        docs.select("lang", TXT.lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "predicted")
    )


_TOKEN_STATS_SQL = rf"""
WITH t AS (SELECT source, len({_TOKS}) AS n FROM documents)
SELECT source,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       round(avg(n), 4) AS avg_tokens,
       CAST(min(n) AS BIGINT) AS min_tokens,
       CAST(max(n) AS BIGINT) AS max_tokens,
       count(*) AS n_docs
FROM t
GROUP BY source
ORDER BY source
"""


@register("txt_token_stats", _TOKEN_STATS_SQL)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count statistics per source — the corpus-profiling pass every
    training-data pipeline runs first."""
    docs = _docs(spark, sf_dir, ["source", "text"])
    n = TXT.token_count("text")
    return (
        docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_tokens"),
            F.round(F.avg("n"), 4).alias("avg_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


# Same regex text as functions.text.BPE_SPLIT_RE, with the leading quote
# doubled for SQL string literals.
# derived from the ONE Python-side pattern (functions/text.py) with SQL
# quote-escaping — a hand-copied twin is exactly how the \\s-vs-\\x0B
# class of divergence slips in on one side only
_BPE_RE_SQL = "'" + TXT.BPE_SPLIT_RE.replace("'", "''") + "'"

_BPE_STATS_SQL = rf"""
WITH t AS (
  SELECT source,
         len(regexp_extract_all(lower(text), {_BPE_RE_SQL})) AS n
  FROM documents)
SELECT source,
       CAST(sum(n) AS BIGINT) AS total_subwords,
       round(avg(n), 4) AS avg_subwords,
       count(*) AS n_docs
FROM t
GROUP BY source
ORDER BY source
"""


@register("txt_bpe_subword_stats", _BPE_STATS_SQL)
def q_bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-budget estimate per source: subword counts under the
    BPE-style pre-tokenizer regex (functions/text.py::bpe_tokens). The
    identical RE2-safe pattern runs on both engines, so the oracle is
    exact."""
    docs = _docs(spark, sf_dir, ["source", "text"])
    n = TXT.bpe_token_count("text")
    return (
        docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_subwords"),
            F.round(F.avg("n"), 4).alias("avg_subwords"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


# Winnowing fingerprints — exact twin of functions/text.py::winnow_fingerprints
# (k=5, w=4, base=257, mod=2^31-1), built from DuckDB list lambdas.
# list_reduce has no init value, so a 0 is prepended to each code list.
_WINNOW_FP_SQL = """
WITH t AS (SELECT doc_id, source, lower(text) AS tt, length(lower(text)) AS n FROM documents),
h AS (
  SELECT doc_id, source,
    CASE WHEN n >= 5 THEN
      list_transform(range(1, n - 3),
        i -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(i, i + 5), j -> CAST(ord(tt[j]) AS BIGINT))),
               (acc, x) -> (acc * 257 + x) % 2147483647))
    ELSE CAST([] AS BIGINT[]) END AS hs
  FROM t),
w AS (
  SELECT doc_id, source,
    CASE WHEN len(hs) >= 4 THEN
      list_distinct(list_transform(range(0, len(hs) - 3), j -> list_min(hs[j+1:j+4])))
    WHEN len(hs) > 0 THEN [list_min(hs)]
    ELSE CAST([] AS BIGINT[]) END AS fp
  FROM h),
e AS (SELECT source, unnest(fp) AS f FROM w)
SELECT source,
       count(*) AS total_fps,
       CAST(count(DISTINCT f) AS BIGINT) AS distinct_fps,
       CAST(min(f) AS BIGINT) AS min_fp,
       CAST(max(f) AS BIGINT) AS max_fp
FROM e
GROUP BY source
ORDER BY source
"""


@register("txt_winnow_fingerprints", _WINNOW_FP_SQL)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing): per-source profile
    of the fingerprint sets — totals, distincts, and value range, matched
    hash-for-hash against the DuckDB list-lambda twin."""
    docs = _docs(spark, sf_dir, ["source", "text"])
    exploded = docs.select(
        "source", F.explode(TXT.winnow_fingerprints("text")).alias("f")
    )
    return (
        exploded.groupBy("source")
        .agg(
            F.count("*").alias("total_fps"),
            F.countDistinct("f").alias("distinct_fps"),
            F.min("f").alias("min_fp"),
            F.max("f").alias("max_fp"),
        )
        .orderBy("source")
    )


# TF-IDF with the smooth-idf formula: idf = ln((N+1)/(df+1)) + 1.
_TFIDF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
), tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), df AS (
  SELECT word, count(*) AS df FROM tf GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT word,
       round(avg(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)), 6) AS avg_tfidf,
       CAST(max(df) AS BIGINT) AS df
FROM tf JOIN df USING (word) CROSS JOIN n
GROUP BY word
ORDER BY avg_tfidf DESC, word
LIMIT 20
"""


@register("txt_tfidf_top_terms", _TFIDF_SQL)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 terms by mean TF-IDF (smooth idf). Two shuffles on the term
    key; df side is broadcast back (vocabulary ≪ corpus). N is a 1-row
    aggregate broadcast-cross-joined into the plan — no blocking
    driver-side ``count()`` and no extra pass over the corpus before the
    real job."""
    docs = _docs(spark, sf_dir, ["doc_id", "text"])
    n = docs.agg(F.count("*").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(TXT.tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(F.broadcast(df_), "word")
        .crossJoin(F.broadcast(n))
        .groupBy("word")
        .agg(
            F.round(F.avg(F.col("tf") * idf), 6).alias("avg_tfidf"),
            F.max("df").alias("df"),
        )
        .orderBy(F.col("avg_tfidf").desc(), "word")
        .limit(20)
    )


_BIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts
  FROM documents
), grams AS (
  SELECT unnest(list_distinct([array_to_string(ts[i:i+1], ' ') for i in range(1, len(ts))])) AS bigram
  FROM toks
  WHERE len(ts) >= 2
)
SELECT bigram, count(*) AS n_docs
FROM grams
GROUP BY bigram
ORDER BY n_docs DESC, bigram
LIMIT 20
"""


@register("txt_top_bigrams", _BIGRAM_SQL)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams by document frequency (distinct per doc — the n-gram
    profile used for shingle/boilerplate analysis)."""
    docs = _docs(spark, sf_dir, ["doc_id", "text"])
    return (
        docs.select(F.explode(TXT.shingles("text", n=2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "bigram")
        .limit(20)
    )
