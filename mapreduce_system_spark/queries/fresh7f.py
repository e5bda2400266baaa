"""Round-7 additions (final): weighted sampling, novelty, moment aggregates.

``pipe_weighted_sample`` — weighted sampling WITHOUT replacement by the
Efraimidis–Spirakis A-ES scheme: each row gets key = u^(1/w) for
uniform u in (0, 1] and weight w, and the k largest keys are an exact
weighted sample. Corpus-mixture construction uses precisely this to
over-sample high-value documents (here w = n_chars, the "prefer longer
documents" mix) while staying reproducible: u derives from md5(doc_id)
— the same RNG-free trick as ``pipe_hash_split``/``pipe_hash_sample``
— so the sample is a pure function of the corpus, stable across
re-runs, partitionings, and engines.

Scale shape: the key is map-only; the global top-k runs as Spark's
``TakeOrderedAndProject`` (per-partition top-k, driver merge of
k × partitions rows) — no global sort, no shuffle of the corpus, the
same physical shape as ``mr_sort_topn``. The oracle recomputes the
identical keys in DuckDB and must select the same k rows.

The reference can express the key computation as a mapf but has no
top-k at all — its only ordering is the per-reduce-partition key sort
(worker.go:16-21,153; SURVEY.md §2b sorts/limits row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.queries._textshared import _TOKS
from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_K = 100

_WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         pow(
           ({md5_bucket32_sql("CAST(doc_id AS VARCHAR)")} + 1)
             / 4294967296.0,
           CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE)
         ) AS k
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, source, n_chars, round(k, 6) AS sample_key
FROM keyed
ORDER BY round(k, 12) DESC, doc_id
LIMIT {_K}
"""


@register("pipe_weighted_sample", _WEIGHTED_SAMPLE_SQL)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} A-ES weighted sample of documents with w = n_chars.

    Inclusion probability rises with weight (the pytest pins the
    sample's mean n_chars above the corpus mean); determinism comes
    from md5-derived uniforms, so the DuckDB oracle reselects the
    exact same rows."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    u = (md5_bucket32(F.col("doc_id").cast("string")) + 1) / 4294967296.0
    k = F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double"))
    return (
        docs.where(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", k.alias("k"))
        # rank on the ROUNDED key, ties broken by doc_id: Java Math.pow and
        # libm pow may differ in the last ulp on identical inputs, so an
        # unrounded ORDER BY makes rank-100 membership engine-dependent
        # (the cosine-rank class of commit 6170faa). 12 digits absorbs ulp
        # noise while keeping the near-1.0 keys of long documents distinct
        # (corpus key spacing is orders of magnitude above 1e-12).
        .orderBy(F.desc(F.round(F.col("k"), 12)), "doc_id")
        .limit(_K)
        .select("doc_id", "source", "n_chars", F.round("k", 6).alias("sample_key"))
    )


# ---------------------------------------------------------------------------
# txt_shingle_novelty — uniqueness scoring for data curation
# ---------------------------------------------------------------------------

_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         {_TOKS} AS ts
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts) - 1)]) AS sg
  FROM toks
  WHERE len(ts) >= 3
), ex AS (
  SELECT doc_id, unnest(sg) AS sg FROM sh
), dfc AS (
  SELECT sg, count(*) AS df FROM ex GROUP BY 1
)
SELECT ex.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       round(avg(CASE WHEN dfc.df = 1 THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END), 4) AS novelty
FROM ex JOIN dfc USING (sg)
GROUP BY ex.doc_id
ORDER BY ex.doc_id
"""


@register("txt_shingle_novelty", _NOVELTY_SQL)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's 3-gram shingles that
    appear in NO other document (corpus df = 1) — the uniqueness metric
    curation pipelines use to find boilerplate (novelty → 0: template
    families, the fixture's planted near-dups) vs one-of-a-kind text
    (novelty → 1). Dual of the dedup pair view: same shingle algebra
    (``functions.text.shingles``, mirrored in the oracle CTEs shared
    with dedup_jaccard_pairs), but aggregated per document instead of
    joined into pairs — two shuffles (shingle df, per-doc mean), no
    doc x doc anywhere. The reference would need two chained MapReduce
    jobs (df count, then re-join) for this."""
    from mapreduce_system_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sh = docs.select("doc_id", F.explode(shingles("text")).alias("sg"))
    dfc = sh.groupBy("sg").agg(F.count("*").alias("df"))
    return (
        sh.join(dfc, "sg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)), 4
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# agg_moments_profile — statistical moment aggregates
# ---------------------------------------------------------------------------

# corr is spelled covar/(sd·sd) over PAIRWISE-complete rows with a nullif'd
# denominator instead of corr(): under ANSI Spark's corr ABORTS THE JOB with
# DIVIDE_BY_ZERO on a zero-variance group (two identical rows suffice —
# found by the r11 random-corpus fuzz) while DuckDB's returns NULL; the
# explicit algebra is the same Pearson estimator, NULLs the degenerate
# group on both engines, and keeps every expression mirrored.
_MOMENTS_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(var_samp(l_discount), 6) AS var_disc,
       round(
         covar_samp(l_quantity, l_extendedprice)
           / nullif(
               stddev_samp(CASE WHEN l_quantity IS NOT NULL
                                 AND l_extendedprice IS NOT NULL
                            THEN l_quantity END)
               * stddev_samp(CASE WHEN l_quantity IS NOT NULL
                                   AND l_extendedprice IS NOT NULL
                              THEN l_extendedprice END),
               0
             ),
         6
       ) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_moments_profile", _MOMENTS_SQL)
def q_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate surface per return flag: sample stddev /
    variance, Pearson correlation, and sample covariance — the sanity
    statistics every feature/ingest pipeline computes before training.
    All four are algebraic aggregates (constant-size partial state:
    n, Σx, Σx², Σxy), so Catalyst runs them partial+final with map-side
    combine exactly like sum/count — one shuffle of 3 groups × a few
    doubles regardless of corpus size. Both engines use the n-1 sample
    definitions; single-pass update-order differences vanish under the
    rounding. (The reference's reduce would need hand-written
    sum-of-squares state for this, worker.go:161-165.)"""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    # Pearson spelled covar/(sd·sd) over pairwise-complete rows with a
    # nullif'd denominator, NOT F.corr: under ANSI, corr() aborts the
    # whole job with DIVIDE_BY_ZERO on any zero-variance group (two
    # identical rows suffice — r11 random-corpus fuzz), and at 100 TB one
    # constant-valued group anywhere would kill the query; DuckDB's corr
    # NULLs it. The explicit algebra NULLs it on both engines and stays
    # expression-mirrored with the oracle.
    pair_ok = F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    sd_q = F.stddev_samp(F.when(pair_ok, F.col("l_quantity")))
    sd_p = F.stddev_samp(F.when(pair_ok, F.col("l_extendedprice")))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(
                F.covar_samp("l_quantity", "l_extendedprice")
                / F.nullif(sd_q * sd_p, F.lit(0.0)),
                6,
            ).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )
