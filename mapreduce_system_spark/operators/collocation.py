"""PMI collocation extraction — association-scored adjacent pairs.

The catalog counts n-grams (``txt_top_bigrams``: document frequency of
distinct-per-doc bigrams) but has no ASSOCIATION measure: raw counts
rank "of the" first forever, while what a corpus analyst (and a
tokenizer-merge or phrase-mining pass in a training-data pipeline)
wants is pairs that co-occur MORE than their parts predict — pointwise
mutual information, ``pmi(x,y) = ln(p(xy) / (p(x)·p(y)))`` (Church &
Hanks, 1990), the classic collocation statistic and the additive
building block of the PPMI matrices behind count-based embeddings.

Conventions (spelled so the SQL oracle mirrors doubles exactly):
``p(xy)`` over the ADJACENT-bigram multiset (N_bi = Σ max(len-1, 0)),
``p(x)`` over the unigram multiset (N_uni = Σ len); a minimum bigram
count floors the estimate (bare PMI is maximized by hapax pairs — the
floor is the standard fix); one ``ln`` over one identically-
parenthesized ratio; ties broken by bigram text. Tokens come from the
repo-wide ``functions.text.tokens`` (no token contains a space, so the
bigram string splits back losslessly).

Staged r15 for an r16 debut (``txt_pmi_collocations`` planned over the
documents table) — the stage-in-N, wire-in-N+1 cadence;
tests/test_collocation.py carries a pure-Python reference, the drafted
DuckDB oracle, and a fuzz sweep.

100 TB posture: two corpus-sized partial+final aggregates (unigram
counts, bigram counts) and nothing else corpus-sized — the count floor
prunes the bigram relation BEFORE the two vocabulary-sized unigram
joins, and the totals are one-row aggregates. No window over the token
stream, no driver-side state beyond the top-k result.

Reference contrast: worker.go:104-165's word count IS the unigram half;
the bigram count is a second map key — but PMI needs both relations
MET (two joins) and normalized by two totals, a multi-input meet the
one-shot map→reduce cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.functions.text import tokens


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """(bigram, n_xy, pmi) — the ``top_k`` adjacent token pairs with
    count >= ``min_count``, ranked by UNROUNDED PMI descending then
    bigram ascending (the rrf_fuse display-rounding discipline: two
    near-equal scores that collide at ``round_to`` decimals still rank
    identically on both engines). NULL / empty texts contribute
    nothing; single-token docs contribute unigrams but no bigrams."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # Project the token array FIRST, then filter on the projected column:
    # filtering on tokens(text_col) post-projection only resolves via
    # Catalyst's missing-attribute rule and tokenizes every document
    # twice before the cache (ADVICE r15).
    base = tracked_cache(
        docs.select(tokens(text_col).alias("ts")).where(
            F.size(F.col("ts")) >= 1
        )
    )
    uni = base.select(F.explode("ts").alias("w")).groupBy("w").agg(
        F.count("*").alias("n_w")
    )
    totals = base.agg(
        F.sum(F.size("ts")).cast("double").alias("nu"),
        F.sum(F.greatest(F.size("ts") - 1, F.lit(0))).cast("double").alias("nb"),
    )
    bi = (
        base.where(F.size("ts") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 2),
                    lambda i: F.concat_ws(
                        " ", F.get("ts", i), F.get("ts", i + 1)
                    ),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").alias("n_xy"))
        .where(F.col("n_xy") >= min_count)
    )
    ux = uni.select(F.col("w").alias("x"), F.col("n_w").alias("nx"))
    uy = uni.select(F.col("w").alias("y"), F.col("n_w").alias("ny"))
    j = (
        bi.select(
            "bigram",
            "n_xy",
            F.split("bigram", " ")[0].alias("x"),
            F.split("bigram", " ")[1].alias("y"),
        )
        .join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(totals))
    )
    pmi_raw = F.log(
        (F.col("n_xy").cast("double") / F.col("nb"))
        / (
            (F.col("nx").cast("double") / F.col("nu"))
            * (F.col("ny").cast("double") / F.col("nu"))
        )
    )
    return (
        j.select(
            "bigram",
            "n_xy",
            pmi_raw.alias("pmi_raw"),
        )
        .orderBy(F.desc("pmi_raw"), "bigram")
        .limit(top_k)
        .select("bigram", "n_xy", F.round("pmi_raw", round_to).alias("pmi"))
    )
