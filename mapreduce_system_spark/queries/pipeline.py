"""Composite training-data-pipeline queries over the documents corpus.

The single-op queries (quality, lang-id, dedup, token stats) prove each
primitive; these two prove the *composition* an LLM data pipeline actually
runs — and that the composition stays one Catalyst plan (filters fused
into the scan stage, one shuffle per keyed step) rather than N separate
jobs.

- ``pipe_pack_sequences``: token-budget sequence packing — assign docs in
  deterministic order to fixed-budget training sequences by cumulative
  token count (contiguous fill, the concatenate-then-chunk packing).
- ``pipe_clean_corpus``: quality gate + language gate + exact-dedup
  survivor in one plan; per-source retention profile.

Both have exact DuckDB oracles built from the same SQL fragments the
single-op queries verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.queries.textstats import _STOPLIST, _TOKS, _marker_score_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import ensure_parallelism, load_table

# Sequence token budget. Small enough that the fixture corpus yields
# several sequences per source; the algebra is budget-independent.
_SEQ_BUDGET = 2048

_PACK_SQL = rf"""
WITH t AS (
  SELECT source, doc_id, len({_TOKS}) AS n FROM documents
), c AS (
  SELECT source, doc_id, n,
         sum(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT source,
       CAST(floor((cum - n) / {_SEQ_BUDGET}.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS seq_tokens
FROM c
GROUP BY source, seq_id
ORDER BY source, seq_id
"""


@register("pipe_pack_sequences", _PACK_SQL)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: docs are laid out in (source,
    doc_id) order and cut into training sequences of ``_SEQ_BUDGET``
    tokens by cumulative count — ``seq_id = floor(tokens_before /
    budget)``, the deterministic concatenate-then-chunk packing.

    Plan shape: one scan, per-source window cumsum (one shuffle on
    source), one bounded aggregation. At 100 TB the window key must be
    finer than ``source`` to avoid one-task-per-source skew — partition by
    (source, shard) with per-shard budgets, same algebra."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents", columns=["source", "doc_id", "text"]))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        docs.select("source", "doc_id", TXT.token_count("text").alias("n"))
        .withColumn("cum", F.sum("n").over(w))
        .withColumn("seq_id", F.floor((F.col("cum") - F.col("n")) / _SEQ_BUDGET).cast("long"))
        .groupBy("source", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("seq_tokens"))
        .orderBy("source", "seq_id")
    )


# Deterministic hash sampling: membership decided by a hash of the stable
# id, NOT by rand()/TABLESAMPLE — the only sampling that is reproducible
# across engines, runs, partitionings, and retries (a must when a 100 TB
# corpus is sampled incrementally: a doc's membership never changes as
# files arrive). First hex nibble of md5 < '2' ⇒ a fixed 1/8 of id space.
_SAMPLE_SQL = """
WITH s AS (
  SELECT source, doc_id
  FROM documents
  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
), t AS (
  SELECT source, count(*) AS n_total FROM documents GROUP BY source
)
SELECT t.source,
       coalesce(count(s.doc_id), 0) AS n_sampled,
       t.n_total,
       round(coalesce(count(s.doc_id), 0)::DOUBLE / t.n_total, 4) AS fraction
FROM t LEFT JOIN s ON s.source = t.source
GROUP BY t.source, t.n_total
ORDER BY t.source
"""


@register("pipe_hash_sample", _SAMPLE_SQL)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample (md5-nibble bucket, 2/16 of id space) with
    a per-source sampling-fraction profile.

    ``df.sample``/TABLESAMPLE are partition- and seed-dependent, so they
    can't be oracle-checked and — worse for a real pipeline — a row's
    membership changes across retries and repartitioning. Hashing the
    stable id makes the sample a pure function of the data, the property
    incremental 100 TB sampling needs. Plan: one scan feeding both the
    filtered count and the total (grouped partial aggs), broadcast join
    of two tiny per-source profiles."""
    docs = load_table(spark, sf_dir, "documents", columns=["source", "doc_id"])
    sampled = (
        docs.where(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    return (
        totals.join(F.broadcast(sampled), "source", "left")
        .select(
            "source",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            "n_total",
            F.round(
                F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_total"), 4
            ).alias("fraction"),
        )
        .orderBy("source")
    )


_CLEAN_SQL = rf"""
WITH base AS (
  SELECT source, doc_id,
         md5(trim(regexp_replace(lower(text), '\W+', ' ', 'g'))) AS fp,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         {_TOKS} AS ts
  FROM documents
), feat AS (
  SELECT source, doc_id, fp,
         len(ts) AS n,
         n_punct::DOUBLE / greatest(n_chars, 1) AS punct_ratio,
         len(list_filter(ts, t -> list_contains({_STOPLIST}, t)))::DOUBLE
           / greatest(len(ts), 1) AS stopword_ratio,
         {_marker_score_sql('en')} AS s_en,
         {_marker_score_sql('es')} AS s_es,
         {_marker_score_sql('de')} AS s_de,
         {_marker_score_sql('fr')} AS s_fr
  FROM base
), scored AS (
  SELECT source, doc_id, fp, n,
         (CASE WHEN n BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
        + CASE WHEN stopword_ratio >= 0.01 THEN 1.0 ELSE 0.0 END
        + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality,
         CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
              WHEN s_es > 0 AND s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
              WHEN s_de > 0 AND s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
              WHEN s_fr > 0 AND s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
              ELSE 'und' END AS predicted
  FROM feat
), dedup AS (
  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS min_id FROM scored
)
SELECT source,
       count(*) AS n_docs_kept,
       CAST(sum(n) AS BIGINT) AS tokens_kept
FROM dedup
WHERE doc_id = min_id AND quality > 0.5 AND predicted = 'en'
GROUP BY source
ORDER BY source
"""


@register("pipe_clean_corpus", _CLEAN_SQL)
def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning in ONE plan: quality gate (≥2 of 3
    checks), heuristic language gate (predicted 'en'), and exact-dedup
    survivorship (min doc_id per content fingerprint via a keyed window —
    no self-join), then a per-source retention profile.

    Plan shape: scan → per-row JVM expressions (fingerprint + quality +
    lang-id fused into the scan stage) → one shuffle on fp (window min) →
    filters → bounded aggregation on source. The scalar gates are
    evaluated BEFORE the shuffle only where semantics allow; the dedup
    window must see all rows, so the fp shuffle carries quality/lang
    columns — at 100 TB, push the cheap gates ahead of the window when
    survivorship should consider only clean docs (different policy, one
    line moved)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents", columns=["source", "doc_id", "text"]))
    w = W.partitionBy("fp")
    return (
        docs.select(
            "source",
            "doc_id",
            TXT.fingerprint("text").alias("fp"),
            TXT.token_count("text").alias("n"),
            TXT.quality_score("text").alias("quality"),
            TXT.lang_id("text").alias("predicted"),
        )
        .withColumn("min_id", F.min("doc_id").over(w))
        .where(
            (F.col("doc_id") == F.col("min_id"))
            & (F.col("quality") > 0.5)
            & (F.col("predicted") == "en")
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs_kept"), F.sum("n").alias("tokens_kept"))
        .orderBy("source")
    )


# GROUPED_MAP (applyInPandas) surface with an exact oracle: per-group
# z-score normalization, profiled per group. The window-function SQL twin
# computes the identical algebra; doubles are rounded to 4 decimals on
# both sides (group mean/std agree to ~1e-12 relative between numpy and
# DuckDB, far inside the rounding).
_ZSCORE_SQL = """
WITH s AS (
  SELECT l_returnflag, l_extendedprice,
         avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS m,
         stddev_samp(l_extendedprice) OVER (PARTITION BY l_returnflag) AS sd
  FROM lineitem
), z AS (
  SELECT l_returnflag, (l_extendedprice - m) / sd AS z FROM s
)
SELECT l_returnflag,
       count(*) AS n,
       round(avg(abs(z)), 4) AS avg_abs_z,
       round(min(z), 4) AS min_z,
       round(max(z), 4) AS max_z
FROM z
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("udf_grouped_map_zscore", _ZSCORE_SQL)
def q_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization through a GROUPED_MAP pandas
    transform (``groupBy().applyInPandas`` — whole group in, transformed
    frame out), profiled per group and checked against the window-function
    SQL identity.

    Honest scale contract (same as the GROUPED_AGG UDAF): each group is
    materialized in one task, so memory is O(max group size). For
    unbounded groups use the pure-SQL window formulation the oracle runs —
    registered here with the pandas path because GROUPED_MAP is the
    surface being verified; normalization that needs learned state per
    group (clipping quantiles, learned scalers) has no SQL form and this
    is its shape."""
    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(spark)
    li = load_table(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def zscore(pdf):
        v = pdf["l_extendedprice"]
        sd = v.std(ddof=1)
        pdf = pdf.assign(z=(v - v.mean()) / sd)
        return pdf[["l_returnflag", "z"]]

    z = li.groupBy("l_returnflag").applyInPandas(zscore, schema="l_returnflag string, z double")
    return (
        z.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.abs(F.col("z"))), 4).alias("avg_abs_z"),
            F.round(F.min("z"), 4).alias("min_z"),
            F.round(F.max("z"), 4).alias("max_z"),
        )
        .orderBy("l_returnflag")
    )
