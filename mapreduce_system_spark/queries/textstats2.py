"""Registered text-analysis queries, part 2: UDTF sentence stats and
corpus heavy hitters.

Split out of ``queries/textstats.py`` for window rotation (the same move
as ``relational2``): these two carried the catalog's oldest driver rows
after round 7, and splitting them lets the r8 correctness window refresh
exactly these two instead of re-spending seven slots on textstats'
r07-green queries. Shared token fragments live in ``_textshared``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.queries._textshared import _TOKS, _docs
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table


# Python UDTF (Spark 4 first-class table function): sentence splitter used
# through a SQL LATERAL join. The oracle replicates the split + token
# algebra with unnest. Sentences = '[.!?]+'-separated spans holding ≥1
# word token.
_UDTF_SQL = r"""
WITH parts AS (
  SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS sent FROM documents
), t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(sent), '\W+'), x -> x <> '')) AS n
  FROM parts
)
SELECT doc_id,
       count(*) AS n_sentences,
       CAST(sum(n) AS BIGINT) AS sentence_tokens,
       CAST(max(n) AS BIGINT) AS max_sentence_tokens
FROM t
WHERE n > 0
GROUP BY doc_id
ORDER BY doc_id
"""


@register("udtf_sentence_stats", _UDTF_SQL)
def q_udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence statistics through a real Python UDTF (1 row → N rows, the
    reference's ``mapf`` shape as a first-class table function,
    worker.go:51 / README.MD:82) driven by a SQL LATERAL join.

    The UDTF is registered per session and built lazily (like the pandas
    UDAFs — decorating at import time needs no session but registration
    does). Row-at-a-time Python is the slow path by design here: this
    query exists to oracle-verify the UDTF API surface; the scalable
    formulation of the same algebra is a JVM explode (see
    ``txt_token_stats``/``mr_word_count``)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="n_tokens bigint")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: D401 - Spark UDTF contract
            import re

            if text is None:
                return
            for sent in re.split(r"[.!?]+", text):
                # re.ASCII matches the oracle's RE2 \W (see _wc_mapf)
                n = len([t for t in re.split(r"\W+", sent.lower(), flags=re.ASCII) if t])
                if n > 0:
                    yield (n,)

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id,
               count(*) AS n_sentences,
               sum(n_tokens) AS sentence_tokens,
               max(n_tokens) AS max_sentence_tokens
        FROM udtf_docs, LATERAL sentence_split(text)
        GROUP BY doc_id
        ORDER BY doc_id
        """
    )


# ---------------------------------------------------------------------------
# Corpus heavy hitters via the two-pass candidate pattern: a single-pass
# lossy-count sketch (DataFrame.stat.freqItems — superset guarantee, merge-
# able partials, NO token shuffle) proposes candidates, then one exact pass
# counts ONLY the candidates. The final filter (cnt > support · N) is exact,
# so the result is pure SQL — and if the sketch ever dropped a true heavy
# hitter, the Spark result would lose a row and the driver's hash check
# would catch it. Candidate support is set BELOW the final support so the
# superset guarantee covers the reported set.
_HH_SUPPORT = 0.033
_HH_CAND_SUPPORT = 0.02

# CAST(.. AS DOUBLE) in the HAVING: a bare 0.033 literal is DECIMAL to
# DuckDB (exact 33n/1000) while the Spark side multiplies an IEEE double
# — on a corpus where some count lands EXACTLY on the boundary (n a
# multiple of 1000) the two thresholds straddle it (0.7*90 ==
# 62.99999999999999 in double is the canonical example, r12 review).
# Casting makes both engines compute the identical double product, so
# the comparison is bit-for-bit the same by construction.
_HEAVY_HITTERS_SQL = rf"""
WITH t AS (
  SELECT unnest({_TOKS}) AS token FROM documents
), tot AS (
  SELECT count(*) AS n FROM t
)
SELECT token, count(*) AS cnt
FROM t, tot
GROUP BY token, n
HAVING count(*) > CAST({_HH_SUPPORT} AS DOUBLE) * n
ORDER BY token
"""


@register("txt_heavy_hitters", _HEAVY_HITTERS_SQL)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level heavy hitters (tokens above 3.3% of all token
    occurrences) — the vocabulary/stop-word/boilerplate detector of a
    training pipeline — computed with the scalable two-pass shape:

    1. ``stat.freqItems`` at support 0.02: one scan, map-side lossy
       counting merged per partition, bounded driver state (≤ 1/support
       items — never the full vocabulary), zero shuffle of tokens.
    2. Exact count of the candidates only: the ``isin`` filter cuts the
       shuffle from O(distinct tokens) to O(candidates) before the
       aggregation; the total-token count rides a separate scan and joins
       in as one broadcast row.

    The algebra relies on the sketch's superset guarantee (candidate
    support < final support): a dropped true heavy hitter would surface
    as a missing output row against the oracle's exact SQL. At 100 TB
    this is the difference between shuffling a zipfian vocabulary and
    shuffling ~30 rows per partition."""
    docs = _docs(spark, sf_dir, ["text"])
    toks = docs.select(F.explode(TXT.tokens("text")).alias("token"))
    candidates = toks.stat.freqItems(["token"], support=_HH_CAND_SUPPORT).first()[0]
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.where(F.col("token").isin(*[str(c) for c in candidates]))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.lit(_HH_SUPPORT) * F.col("n"))
        .select("token", "cnt")
        .orderBy("token")
    )
