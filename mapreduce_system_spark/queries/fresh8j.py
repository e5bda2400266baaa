"""Round-8 additions (tenth batch — registered past the 50-query driver
window behind fresh8i; rotates in r9).

Three analytics staples a data-curation team runs weekly:

- ``fn_cohort_retention`` — weekly cohort retention triangle over the
  events stream: users cohorted by first-activity week, per-offset
  active counts and retention ratios. The canonical product-analytics
  join of two aggregates; every ratio divides exact integers.
- ``txt_vocab_coverage`` — token-occurrence coverage of the top-k
  vocabulary at k ∈ {10, 100, 1000, 10000}: the tokenizer-sizing
  curve (how big must the vocab be to cover 95% of the stream?).
  Scale-safe by BOUNDING the ranked relation to max(k) rows via
  TakeOrderedAndProject before the single-partition ranking window —
  the corpus-sized work is one word-count aggregate.
- ``graph_degree_distribution`` — log₂-binned degree histogram of the
  part co-purchase graph: the first thing to look at before any graph
  workload (it decides whether the triangle census's degree
  orientation or PageRank's skew posture matters). Exact integer
  bins; log2 of a positive BIGINT floors identically on both engines
  (IEEE log2 is exact at the only values where floor could flip —
  powers of two).

Float discipline per registry.py: all three queries' doubles are
ratios of exact integers — bit-identical across engines before the
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators import graph as G
from mapreduce_system_spark.queries._graphshared import copurchase_pairs
from mapreduce_system_spark.functions.text import tokens
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# fn_cohort_retention — weekly cohort triangle over the events stream
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH c AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM c GROUP BY cohort_week
),
a AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7 AS INT)
           AS week_offset
  FROM events e JOIN c ON c.user_id = e.user_id
),
r AS (
  SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
  FROM a GROUP BY cohort_week, week_offset
)
SELECT strftime(r.cohort_week, '%Y-%m-%d') AS cohort_week,
       r.week_offset, r.n_active, s.cohort_size,
       round(CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6)
         AS retention
FROM r JOIN sizes s ON s.cohort_week = r.cohort_week
ORDER BY cohort_week, week_offset
"""


@register("fn_cohort_retention", _COHORT_SQL)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their
    first event; for each (cohort, week offset), how many cohort
    members were active and what fraction of the cohort that is.

    Three aggregates, all partial+final with map-side combine: first
    touch per user (min), distinct (user, week) activity, then the
    per-cell counts; cohort sizes ride in via a join keyed on the
    handful of cohort weeks (broadcast-sized — cohorts grow with
    TIME, not data). Week arithmetic is exact: date_trunc to Monday
    on both engines, offsets as whole-day differences integer-divided
    by 7, and retention divides exact integers."""
    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id"])
    c = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    sizes = c.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    a = (
        ev.join(c, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    r = a.groupBy("cohort_week", "week_offset").agg(F.count("*").alias("n_active"))
    return (
        r.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# txt_vocab_coverage — top-k vocabulary coverage of the token stream
# ---------------------------------------------------------------------------

_COVERAGE_KS = (10, 100, 1000, 10000)

_COVERAGE_SQL = rf"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '\W+')) AS word FROM documents
),
wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c
  FROM tok WHERE word <> '' GROUP BY word
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_vocab FROM wc),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rn
  FROM wc ORDER BY c DESC, word LIMIT {max(_COVERAGE_KS)}
)
SELECT k,
       CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END) AS BIGINT) AS covered_tokens,
       t.total AS total_tokens,
       t.n_vocab,
       round(CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END) AS DOUBLE)
             / CAST(t.total AS DOUBLE), 6) AS coverage
FROM top CROSS JOIN tot t
CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _COVERAGE_KS)}]) AS k)
GROUP BY k, t.total, t.n_vocab
ORDER BY k
"""


@register("txt_vocab_coverage", _COVERAGE_SQL)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of all token occurrences do the top-k vocabulary
    terms cover, for k ∈ {10, 100, 1000, 10000}? The tokenizer-sizing
    curve (and the OOV-rate complement) every vocab decision starts
    from.

    The corpus-sized work is ONE word-count aggregate. The ranking
    then operates on a relation BOUNDED to max(k) rows — taken with
    TakeOrderedAndProject (per-partition heaps, no global sort of the
    vocabulary) — so the single-partition row_number window that
    follows ranks ≤10⁴ rows no matter how large the corpus vocabulary
    grows; the k-membership sums and the one-row totals are ordinary
    aggregates with broadcast riders. Deterministic ties: (count DESC,
    word) on both engines."""
    docs = load_table(spark, sf_dir, "documents", columns=["text"])
    tok = docs.select(F.explode(tokens("text")).alias("word"))
    wc = tok.groupBy("word").agg(F.count("*").alias("c"))
    tot = wc.agg(
        F.sum("c").alias("total"), F.count("*").alias("n_vocab")
    )
    # The partition-less row_number window below logs "WindowExec: No
    # Partition Defined" — BOUNDED BY CONSTRUCTION, not a defect (VERDICT
    # r13): the limit() plans as TakeOrderedAndProject, so the windowed
    # relation holds at most max(k)=10^4 rows regardless of corpus size.
    top = (
        wc.orderBy(F.desc("c"), "word")
        .limit(max(_COVERAGE_KS))
        .select(
            "c",
            F.row_number().over(W.orderBy(F.desc("c"), "word")).alias("rn"),
        )
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _COVERAGE_KS])).alias("k")
    covered = F.sum(F.when(F.col("rn") <= F.col("k"), F.col("c")).otherwise(0))
    return (
        top.crossJoin(F.broadcast(tot))
        .select("c", "rn", "total", "n_vocab", ks)
        .groupBy("k", "total", "n_vocab")
        .agg(
            covered.alias("covered_tokens"),
            F.round(
                covered.cast("double") / F.col("total").cast("double"), 6
            ).alias("coverage"),
        )
        .select(
            "k",
            "covered_tokens",
            F.col("total").alias("total_tokens"),
            "n_vocab",
            "coverage",
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# graph_degree_distribution — log2-binned degree histogram
# ---------------------------------------------------------------------------

_DEGREE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM pr UNION ALL SELECT v AS node FROM pr)
  GROUP BY node
)
SELECT CAST(floor(log2(d)) AS INT) AS degree_bin,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(d) AS BIGINT) AS min_degree,
       CAST(max(d) AS BIGINT) AS max_degree
FROM deg
GROUP BY 1
ORDER BY 1
"""


@register("graph_degree_distribution", _DEGREE_SQL)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned degree histogram of the part co-purchase graph —
    the scale-free-or-not diagnostic run before committing to a graph
    algorithm's skew posture (a heavy tail is what makes the triangle
    census's degree orientation and PageRank's combiner matter).

    Edge construction is the triangle census's (distinct per-order
    pair join); degrees are one partial+final aggregate and the
    histogram a second over ~log₂(max degree) groups. Binning is
    exact: floor(log2(d)) can only flip at powers of two, where IEEE
    log2 is exact on both engines."""
    pr = copurchase_pairs(spark, sf_dir)
    # degree table via the operator's shared one-pass explode census
    # (r17): the inline unionAll-of-two-projections spelling planned the
    # whole copurchase construction once per branch — and a private
    # spelling here could drift from the census the graph operators
    # actually use (this module's anti-drift doctrine).
    deg = G.degree_census(pr)
    return (
        deg.groupBy(F.floor(F.log2("d")).cast("int").alias("degree_bin"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
        .orderBy("degree_bin")
    )
