"""Interpolated Kneser-Ney bigram scoring — the smoothed LM the
surprisal queries approximate.

The registered perplexity proxies score documents under the corpus's
own counts with the crudest smoothers: ``txt_unigram_surprisal`` (no
context) and ``txt_bigram_surprisal`` (add-one — which famously
overtaxes frequent contexts and hands unseen events far too much
mass). Kneser-Ney (Ney-Essen-Kneser 1994; Chen & Goodman 1999's
interpolated form) is the standard fix and the score modern corpus
filters (CCNet-style) actually rank by: absolute-discount every seen
bigram by D and hand the freed mass to a CONTINUATION unigram —
P_cont(w2) proportional to how many distinct contexts w2 follows, not
how often it occurs ("francisco" is frequent but follows only "san",
so it gets almost no continuation mass — the example the whole method
is built on).

    P_KN(w2 | w1) = max(c(w1 w2) - D, 0) / c(w1)
                    + (D * N1+(w1 *) / c(w1)) * P_cont(w2)
    P_cont(w2)    = N1+(* w2) / N1+(* *)

with c(w1) = sum_w2 c(w1 w2) (left-context token count), N1+ the
distinct-continuation type counts, and D in (0, 1) fixed (0.75, the
Chen-Goodman default). Every input is an EXACT integer aggregate of
the corpus bigram table; both engines compose the same division/ln
with identical parenthesization, so a full-value oracle holds after
output rounding (the txt_*_surprisal discipline).

Per-document score: the transition-weighted mean of -ln P_KN over the
document's adjacent token pairs — every document bigram is present in
the corpus table by construction (the corpus includes the document),
so no unseen-event branch is needed; the discount still reshapes every
probability, which is what distinguishes the score from the add-one
twin (pinned by test).

Staged r16, registered r17 (``txt_kneser_ney_surprisal``, fresh17);
tests/test_lm.py carries the pure-Python reference, the DuckDB oracle
draft, the probability-mass law, and a fuzz. The mass law, stated
precisely: summing P_KN(w2|w1) over the WHOLE continuation vocabulary
(seen and unseen w2 — the interpolated term applies to all) equals 1
per context (test_full_mass_sums_to_one_over_vocabulary). Over the
rows ``kneser_ney_bigram_probs`` RETURNS — seen bigram types only —
the per-context sum is strictly less: 1 minus the backoff mass routed
to unseen continuations, (D * N1+(w1 *)/c(w1)) * (unseen continuation
mass).
Probe: ``tools/scale_probe.py --knlm`` (disjoint token-salted shards:
per-shard scores must be IDENTICAL across scales — each shard is its
own closed vocabulary — while wall tracks the corpus).

100 TB posture: one tokenize pass; everything downstream derives from
the (doc, w1, w2, cnt) aggregate — the corpus tables are its vocab- or
bigram-type-sized re-aggregations (partial+final combinable), joined
back by (w1, w2) with no broadcast hints (AQE sizes them; the
txt_kl_divergence precedent). No driver state, no collects.

Reference contrast: worker.go:104-165 can produce any ONE of the five
count tables; the score joins a reducer's output against four other
reducers' outputs keyed by its own components — a reduce-of-reduces
pipeline the one-shot model cannot express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_bigram_counts(
    docs: DataFrame, id_col: str, tokens_col: Column
) -> DataFrame:
    """(doc_id, w1, w2, cnt): adjacent-pair counts per document from a
    token-array expression — the zip-against-own-tail shape
    (txt_bigram_cond_entropy's), one explode, no token-stream
    self-join. Documents with < 2 tokens contribute nothing."""
    ts = docs.select(F.col(id_col).alias("doc_id"), tokens_col.alias("ts"))
    pairs = ts.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            )
        ).alias("p"),
    )
    return (
        pairs.select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def kneser_ney_bigram_probs(
    doc_bigrams: DataFrame, discount: float = 0.75
) -> DataFrame:
    """(w1, w2, p_kn): interpolated Kneser-Ney probability for every
    bigram TYPE in the corpus, derived entirely from the per-document
    bigram counts (re-aggregation, no second tokenize). ``discount``
    must sit in (0, 1) — 0 degenerates to raw MLE, 1 discounts seen
    mass away entirely."""
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    bg = doc_bigrams.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    left = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1p_left")
    )
    right = bg.groupBy("w2").agg(F.count("*").alias("n1p_right"))
    n_types = bg.select(
        F.count("*").cast("double").alias("n1p_all")
    )
    d = F.lit(float(discount))
    return (
        bg.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(n_types))
        .select(
            "w1",
            "w2",
            (
                F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
                + (d * F.col("n1p_left") / F.col("c1"))
                * (F.col("n1p_right") / F.col("n1p_all"))
            ).alias("p_kn"),
        )
    )


def kneser_ney_doc_scores(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    discount: float = 0.75,
) -> DataFrame:
    """(doc_id, n_transitions, kn_surprisal): per-document
    transition-weighted mean -ln P_KN under the corpus's own bigram
    tables. Single-token and empty documents are absent (no
    transitions to score)."""
    db = doc_bigram_counts(docs, id_col, tokens_col)
    probs = kneser_ney_bigram_probs(db, discount=discount)
    return (
        db.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_transitions"),
            (
                F.sum(F.col("cnt") * -F.log("p_kn")) / F.sum("cnt")
            ).alias("kn_surprisal"),
        )
    )
