"""Round-8 additions (ninth batch — registered past the 50-query driver
window behind fresh8h; rotates in r9).

Four operators rounding out the training-pipeline surface:

- ``pipe_group_kfold`` — leakage-free cross-validation folds: every
  DOCUMENT of a source lands in the same fold (fold is a pure md5
  function of the source key), so near-duplicate documents from one
  source can never straddle train/eval. The group-aware sibling of
  the row-level ``pipe_hash_split``.
- ``txt_ttr_lexical_diversity`` — per-document type–token ratio and
  hapax share: the classic lexical-diversity screen next to the
  entropy (``txt_entropy_quality``) and repetition
  (``pipe_repetition_filter``) filters. Exact integer ratios.
- ``emb_centroid_distance_matrix`` — pairwise cosine between the
  per-label centroids: the cluster-separation audit run after any
  labeling/clustering pass. The only data-sized work is the centroid
  aggregate (k·d partial+final); the k×k matrix itself is
  dimension-sized, never corpus-sized.
- ``fn_moving_window_stats`` — trailing 7-row moving mean/min/max per
  user: the rolling-feature primitive for event-stream feature
  engineering, one ROWS-frame window over one exchange+sort.

Float discipline per registry.py: ratios divide exact integers;
centroid cosines and moving means round at 6/4 with O(1)-magnitude
values, so summation-order ULP noise sits ~8 orders below the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# pipe_group_kfold — group-aware cross-validation fold assignment
# ---------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_SQL = f"""
WITH f AS (
  SELECT source, lang, n_chars,
         {md5_bucket32_sql("source")} % {_KFOLD_K} AS fold
  FROM documents
)
SELECT CAST(fold AS INT) AS fold,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM f
GROUP BY fold
ORDER BY fold
"""


@register("pipe_group_kfold", _KFOLD_SQL)
def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold assignment with GROUP integrity: fold = md5(source) mod k,
    so all documents of a source share a fold and near-duplicates
    within a source can never leak across a train/eval boundary —
    the failure mode a row-level split (``pipe_hash_split``) cannot
    prevent. Reported per fold: source count, document count, chars.

    Map-only fold assignment (pure function of the group key — stable
    under re-runs, repartitioning, and incremental ingest) plus one
    rollup; distinct-source counting is the only second aggregate.
    The md5 bucketing is the catalog's standard, bit-identical on
    both engines."""
    docs = load_table(
        spark, sf_dir, "documents", columns=["source", "lang", "n_chars"]
    )
    fold = (md5_bucket32("source") % _KFOLD_K).cast("int")
    return (
        docs.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# txt_ttr_lexical_diversity — type-token ratio + hapax share per document
# ---------------------------------------------------------------------------

_TTR_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS word
  FROM documents
),
wc AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM tok WHERE word <> '' GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_share
FROM wc
GROUP BY doc_id
ORDER BY doc_id
"""


@register("txt_ttr_lexical_diversity", _TTR_SQL)
def q_ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type–token ratio and hapax share per document — the lexical-
    diversity screen (template/boilerplate text scores low TTR, random
    gibberish scores ~1.0 with high hapax share); complements the
    character-entropy and repetition filters.

    One tokenize pass → per-(doc, word) counts → per-doc rollup: two
    hash aggregates, both partial+final, both keyed by doc_id after
    the first — so the second agg reuses the first's partitioning.
    Linear in tokens; both ratios divide exact integers, making the
    doubles bit-identical across engines before rounding."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\W+")).alias("word"),
    ).where(F.col("word") != "")
    wc = tok.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(
                F.count("*").cast("double") / F.sum("c").cast("double"), 6
            ).alias("ttr"),
            F.round(
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("hapax_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# emb_centroid_distance_matrix — pairwise cosine between label centroids
# ---------------------------------------------------------------------------

_CENTROID_MATRIX_SQL = """
WITH comp AS (
  SELECT label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
c AS (SELECT label, pos, avg(v) AS m FROM comp GROUP BY label, pos),
p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.m * b.m) AS dot, sum(a.m * a.m) AS na, sum(b.m * b.m) AS nb
  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b,
       round(dot / nullif(sqrt(na) * sqrt(nb), 0), 6) AS cosine
FROM p
ORDER BY label_a, label_b
"""


@register("emb_centroid_distance_matrix", _CENTROID_MATRIX_SQL)
def q_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between the per-label embedding
    centroids — the cluster-separation audit (labels whose centroids
    sit near cosine 1 are candidates for merging; the filtering twin
    is ``emb_centroid_outliers``).

    The ONLY corpus-sized step is the (label, pos) centroid aggregate
    — posexplode then partial+final avg, the ``emb_int8_quantize_error``
    shape. Everything after operates on k·d centroid components: the
    pos-keyed self-join and the k² pair rollup are dimension-sized
    (k²·d pairs ≪ any corpus), so the matrix costs the same at 100 TB
    as at fixture scale. Both engines compute cosine relationally from
    identical centroid components — no fold-order divergence."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["label", "embedding"])
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "vf")
    ).select("label", "pos", F.col("vf").cast("double").alias("v"))
    c = comp.groupBy("label", "pos").agg(F.avg("v").alias("m"))
    a, b = c.alias("a"), c.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.sum(F.col("a.m") * F.col("b.m")).alias("dot"),
            F.sum(F.col("a.m") * F.col("a.m")).alias("na"),
            F.sum(F.col("b.m") * F.col("b.m")).alias("nb"),
        )
    )
    return p.select(
        "label_a",
        "label_b",
        # nullif-guard: a zero-norm centroid (degenerate label) makes the
        # denominator 0 — Spark non-ANSI division yields NULL, DuckDB IEEE
        # yields NaN; pin both to NULL (ADVICE-r8 class, proactive)
        F.round(
            F.col("dot") / F.nullif(F.sqrt("na") * F.sqrt("nb"), F.lit(0.0)), 6
        ).alias("cosine"),
    ).orderBy("label_a", "label_b")


# ---------------------------------------------------------------------------
# fn_moving_window_stats — trailing 7-row rolling features per user
# ---------------------------------------------------------------------------

_MOVING_SQL = """
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       round(avg(value) OVER w, 4) AS mov_avg,
       round(min(value) OVER w, 2) AS mov_min,
       round(max(value) OVER w, 2) AS mov_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_us, event_id
"""


@register("fn_moving_window_stats", _MOVING_SQL)
def q_moving_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving mean/min/max of each user's event values —
    the rolling-feature primitive of event-stream feature engineering
    (the ROWS-frame sibling of ``rel_window_range_frames``'s RANGE
    frames and ``fn_ewma_user_value``'s decayed weighting).

    All four frame aggregates share ONE window spec, so the plan is a
    single exchange + sort on (user_id | ts, event_id); the bounded
    7-row frame keeps per-row state O(1) — no unbounded buffering.
    The unique (ts, event_id) ordering makes every frame's membership
    deterministic, and min/max/count are exact; only the 7-term mean
    carries float noise, ~10 orders below its rounding grid."""
    ev = load_table(
        spark, sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count("*").over(w).alias("n_window"),
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
        F.round(F.min("value").over(w), 2).alias("mov_min"),
        F.round(F.max("value").over(w), 2).alias("mov_max"),
    ).orderBy("user_id", "ts_us", "event_id")
