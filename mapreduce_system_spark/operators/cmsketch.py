"""Mergeable Count-Min frequency sketch — the sketch-table family's
fourth leg.

The persisted-summary pattern now answers three of the four questions a
100 TB ingestion pipeline asks of its history without rescanning it:
"how many distinct" (operators/hll.py), "which quantile"
(operators/histsketch.py), "have we seen this key" (operators/
bloomsketch.py). The remaining one is FREQUENCY: "about how often has
this key occurred across the whole corpus?" — the question behind
stop-token discovery, crawl-source throttling, and heavy-hitter
pre-screens, where the exact answer (a full groupBy over every token
ever ingested) costs a corpus-sized shuffle per batch. The Count-Min
sketch (Cormode & Muthukrishnan 2005) answers it from a d×w-bounded
counter table with ONE-SIDED error: est(key) >= true(key) always
(collisions only ever ADD), and est(key) <= true(key) + eps·N with
probability 1-delta for w = ceil(e/eps), d = ceil(ln 1/delta). The
one-sidedness is the same property that made the Bloom sketch
gate-friendly: the registered audit can ship ``est - exact`` as a
column and assert it is never negative — an invariant, not a tolerance.

Representation: SPARSE and relational, like the Bloom sketch — the
sketch is a (``r``, ``pos``, ``cnt``) relation, one row per NON-ZERO
counter, at most d·w rows however large the corpus (the d·w cap is the
whole point: the recurring per-batch cost of frequency lookup is
CONSTANT in corpus size). Hashing: the repo-wide ``md5_bucket32``
uniform over ``key || ':' || r`` for r in [0, d) — the Bloom sketch's
exact discipline (functions/hashing.py single-spelling), so the DuckDB
oracle re-derives every position bit-for-bit.

Merge is EXACT: counters add (``unionByName`` + groupBy(r, pos) sum —
commutative, associative, integer, bit-stable under any partitioning).
As with the Bloom sketch and unlike HLL's order-dependent HIP estimate,
the point estimates are a PURE FUNCTION of the input multiset, so a
full-value SQL oracle can assert them exactly.

Staged r16 for an r17/r18 debut (``agg_cms_heavy_hitters`` planned:
CMS point estimates vs exact counts for the documents table's frequent
tokens, with the overcount audit shipped as data); tests/test_cmsketch.py
carries the pure-Python reference, the DuckDB oracle draft the
registration will interpolate, the merge law, the one-sided-error
invariant, and a multi-corpus fuzz — the bloomsketch/histsketch staging
pattern. Probe: ``tools/scale_probe.py --cms`` (overcount-vs-eps·N
tracking and the d·w-bounded recurring cost at 1x/10x).

100 TB posture: the build is ONE map-side explode (d rows per
occurrence) + one partial+final integer sum on (r, pos) — the shuffle
is bounded by d·w rows AFTER the map-side combine, whatever the input
row count; the estimate side is one equi-join of the query keys' d·|Q|
positions against the d·w-bounded sketch (broadcastable at any corpus
size) + one min-aggregate per key. No driver state, no collects.

Reference contrast: worker.go:104-165's one-shot map→reduce IS the
exact groupBy this sketch replaces — but it must rescan the corpus
every batch. The sketch build is the same shape ONCE, and every later
batch joins against the d·w-bounded reduced output — a join against
derived state that coordinator.go:126-141's single map→reduce pipeline
cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_system_spark.functions.hashing import md5_bucket32


def cms_build(
    keys: DataFrame,
    key_col: str,
    w: int = 2048,
    d: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """The sparse Count-Min sketch of a key column: for every NON-NULL
    occurrence, d counter bumps at ``(r, md5_bucket32(key || ':' || r)
    % w)`` for r in [0, d); the sketch relation is the per-cell sum —
    (``r``, ``pos``, ``cnt``), at most d·w rows, only non-zero cells
    materialized. ``weight_col`` (optional, cast to long) counts each
    row with its weight instead of 1; NULL weight counts as 0.
    NEGATIVE weights are accepted (the turnstile stream model —
    deletions as negative updates) but they VOID the one-sided
    guarantee: with any negative update, ``cms_estimate``'s min can
    undershoot the true count, so callers shipping the est >= exact
    audit (the registered query does) must keep weights non-negative.
    Merging sketches built with the same (w, d) is
    ``cms_merge(a, b)`` — exact integer addition.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    s = keys.select(
        F.col(key_col).cast("string").alias("key"),
        (
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
            if weight_col is not None
            else F.lit(1).cast("long")
        ).alias("wt"),
    ).where(F.col("key").isNotNull())
    rows = F.array(*[F.lit(r) for r in range(d)])
    return (
        s.select(F.explode(rows).alias("r"), "key", "wt")
        .select(
            "r",
            F.pmod(
                md5_bucket32(F.concat(F.col("key"), F.lit(":"), F.col("r"))),
                F.lit(w),
            ).alias("pos"),
            "wt",
        )
        .groupBy("r", "pos")
        .agg(F.sum("wt").alias("cnt"))
        .where(F.col("cnt") != 0)
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact merge of two sketches built with the SAME (w, d): counters
    add cell-wise. Commutative, associative, bit-stable — the merged
    sketch equals the sketch of the concatenated inputs exactly."""
    return (
        a.unionByName(b)
        .groupBy("r", "pos")
        .agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") != 0)
    )


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    key_col: str,
    w: int = 2048,
    d: int = 4,
) -> DataFrame:
    """(key, est) for each DISTINCT non-NULL query key: ``est`` is the
    MINIMUM over the d rows of the key's counter cells (an absent cell
    reads 0 — the key was never inserted on that row, so its true count
    is bounded by 0 there and the min is exact). (w, d) must match the
    build — mismatched parameters produce garbage, which is why the
    planned registration derives both sides from one constant pair.
    One-sided: est >= true count always; est == 0 proves absence."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    s = (
        queries.select(F.col(key_col).cast("string").alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
    )
    rows = F.array(*[F.lit(r) for r in range(d)])
    cells = s.select(F.explode(rows).alias("r"), "key").select(
        "r",
        "key",
        F.pmod(
            md5_bucket32(F.concat(F.col("key"), F.lit(":"), F.col("r"))),
            F.lit(w),
        ).alias("pos"),
    )
    return (
        cells.join(sketch, ["r", "pos"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
