r"""Round-8 additions (third batch): corpus curation operators.

- ``pipe_stratified_sample`` — per-language stratified sampling with a
  fixed per-stratum target count: inclusion is the pure integer
  predicate ``md5_32(doc_id) * n_lang < target * 2^32`` — a
  deterministic Bernoulli(target/n_lang) draw keyed on the row id, so
  the sample is stable under re-runs, re-partitioning, and incremental
  ingest, and the stratum rates adapt to stratum sizes without any
  RNG state. All-integer comparison: zero float divergence between
  engines by construction.
- ``pipe_source_mix_weights`` — temperature-flattened source mixing
  (the multilingual/LLM data-mix formula w_s ∝ p_s^α, α = 0.5):
  computes each source's character share, the flattened sampling
  weight, and the expected document budget allocation. Pure
  aggregation over a handful of source rows after one scan.
- ``dedup_containment_pairs`` — shingle containment
  C = |A∩B| / min(|A|,|B|) (operators/dedup.py::containment_pairs):
  the asymmetric near-dup measure that catches a short document
  embedded verbatim in a long one, which Jaccard misses by
  construction. Same inverted-index candidate join and stop-shingle
  DF cap as the Jaccard family — linear in postings, never doc×doc.

Reference contrast: all three need either two passes with a join
(sample rates, mix weights) or a self-join on derived keys
(containment) — the reference's single map→reduce cannot express any
of them (coordinator.go:126-141); its closest primitive is the custom
mapf hook (worker.go:51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.dedup import containment_pairs
from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# pipe_stratified_sample
# ---------------------------------------------------------------------------

_STRATUM_TARGET = 100  # target docs per language stratum
_U32 = 1 << 32

_STRAT_SQL = f"""
WITH nl AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
d AS (
  SELECT d.lang, d.n_chars, nl.n_l,
         CAST({md5_bucket32_sql("CAST(d.doc_id AS VARCHAR)")} AS BIGINT) AS u
  FROM documents d JOIN nl USING (lang)
)
SELECT lang,
       CAST(max(n_l) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE u * n_l < {_STRATUM_TARGET} * {_U32}) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) FILTER (WHERE u * n_l < {_STRATUM_TARGET} * {_U32}) AS BIGINT) AS sampled_chars,
       round(least(1.0, {_STRATUM_TARGET} / CAST(max(n_l) AS DOUBLE)), 6) AS target_rate
FROM d
GROUP BY lang
ORDER BY lang
"""


@register("pipe_stratified_sample", _STRAT_SQL)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: each language stratum is thinned
    toward a fixed target count with an md5-keyed integer inclusion
    predicate (u · n_lang < target · 2³²) — Bernoulli(target/n_lang)
    per row, no RNG state, exact integer comparison on both engines.
    Two shuffles total (stratum counts, final rollup); the per-stratum
    count table is genuinely tiny and broadcast back onto the scan."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    nl = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    u = md5_bucket32(F.col("doc_id").cast("string"))
    hit = (u * F.col("n_l")) < F.lit(_STRATUM_TARGET * _U32)
    return (
        docs.join(F.broadcast(nl), "lang")  # one row per language
        .select("lang", "n_chars", "n_l", hit.alias("hit"))
        .groupBy("lang")
        .agg(
            F.max("n_l").cast("long").alias("n_total"),
            F.count_if("hit").cast("long").alias("n_sampled"),
            F.sum(F.when(F.col("hit"), F.col("n_chars"))).cast("long").alias("sampled_chars"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(_STRATUM_TARGET)) / F.max("n_l").cast("double"),
                ),
                6,
            ).alias("target_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# pipe_source_mix_weights
# ---------------------------------------------------------------------------

_MIX_BUDGET = 10000  # documents in the hypothetical training mix

_MIX_SQL = f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(CAST(chars AS DOUBLE)) AS t FROM s),
pa AS (
  SELECT s.*, sqrt(CAST(chars AS DOUBLE) / tot.t) AS pa, CAST(chars AS DOUBLE) / tot.t AS p
  FROM s CROSS JOIN tot
),
spa AS (SELECT sum(pa) AS sp FROM pa)
SELECT source, n_docs, chars,
       round(p, 6) AS char_share,
       round(pa.pa / spa.sp, 6) AS mix_weight,
       CAST(floor((pa.pa / spa.sp) * {_MIX_BUDGET}) AS BIGINT) AS budget_docs
FROM pa CROSS JOIN spa
ORDER BY source
"""


@register("pipe_source_mix_weights", _MIX_SQL)
def q_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened data-mix weights per source (w ∝ p^0.5,
    the standard α-sampling used to up-weight small sources in training
    mixes), with each source's expected share of a {10000}-document
    budget. One scan + one tiny aggregate; every subsequent step
    operates on one row per source (cross joins of one-row totals)."""
    docs = load_table(spark, sf_dir, "documents", columns=["source", "n_chars"])
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    tot = s.agg(F.sum(F.col("chars").cast("double")).alias("t"))
    pa = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "chars",
        (F.col("chars").cast("double") / F.col("t")).alias("p"),
        F.sqrt(F.col("chars").cast("double") / F.col("t")).alias("pa"),
    )
    spa = pa.agg(F.sum("pa").alias("sp"))
    w = F.col("pa") / F.col("sp")
    return (
        pa.crossJoin(F.broadcast(spa))
        .select(
            "source",
            "n_docs",
            "chars",
            F.round("p", 6).alias("char_share"),
            F.round(w, 6).alias("mix_weight"),
            F.floor(w * F.lit(_MIX_BUDGET)).cast("long").alias("budget_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dedup_containment_pairs
# ---------------------------------------------------------------------------

_CONTAIN_THRESHOLD = 0.6
_MAX_SHINGLE_DF = 100  # same stop-shingle cap as queries/dedup.py

# Same capped-shingle CTE body as queries/dedup.py::_JACCARD_CAPPED_CTES
# (kept literal — importing dedup at module scope would register its
# queries early and shift the correctness window), with the containment
# denominator least(|A|,|B|) in place of the union size.
_CONTAIN_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts) - 1)]) AS sg
  FROM toks
  WHERE len(ts) >= 3
), hot AS (
  SELECT COALESCE(list(shingle), []) AS hots
  FROM (
    SELECT shingle FROM (SELECT doc_id, unnest(sg) AS shingle FROM sh)
    GROUP BY shingle HAVING count(*) > {_MAX_SHINGLE_DF}
  )
), shf AS (
  SELECT doc_id, len(sg) AS sz,
         list_filter(sg, s -> NOT list_contains(hots, s)) AS sgf
  FROM sh CROSS JOIN hot
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.sgf, b.sgf))::DOUBLE / least(a.sz, b.sz) AS c
  FROM shf a JOIN shf b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sgf, b.sgf)) > 0
)
SELECT id_a, id_b, round(c, 6) AS containment
FROM pairs
WHERE c >= {_CONTAIN_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("dedup_containment_pairs", _CONTAIN_SQL)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection by shingle containment ≥ {0.6}: the
    asymmetric measure that fires when a short document is embedded in
    a long one. Candidates come from the same inverted-index equi-join
    + stop-shingle cap as the Jaccard family (the DuckDB twin is the
    all-pairs formulation — tractable only at oracle scale, which is
    the 100 TB argument for the index join)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = containment_pairs(
        docs, threshold=_CONTAIN_THRESHOLD, max_shingle_df=_MAX_SHINGLE_DF
    )
    return out.select(
        "id_a", "id_b", F.round("containment", 6).alias("containment")
    ).orderBy("id_a", "id_b")
