"""Sketch-driven frequent items, verified to exactness.

The third leg of the approximate-aggregate family (HLL
``approx_count_distinct`` and KLL ``approx_percentile`` are driver-gated
with error-band oracles; frequency was the missing sketch): Spark's
built-in ``DataFrame.stat.freqItems`` — the Karp-Papadimitriou-Shenker /
Misra-Gries lossy-count generalization ("proposed by Karp et al." in the
Spark API docs, a PUBLIC algorithm) — finds every item whose frequency
exceeds ``support`` in ONE pass with ≤ 1/support counters per partition
and a same-size merge, no shuffle of per-key partials at all.

The sketch's contract is one-sided: NO false negatives (every truly
frequent item is in the candidate set), but false positives whose
identity depends on partition/merge order. That tail would break any
value-hash oracle, so the operator VERIFIES: the candidate set (≤
1/support ids, a driver-bounded list by construction) filters one exact
aggregate, and only candidates passing the exact threshold survive. The
output is therefore deterministic and exactly the frequent-item relation
— computed WITHOUT a full-key groupBy.

100 TB posture: the win over ``exact groupBy + filter`` is the key
dimension. A full groupBy on a billion-distinct column shuffles a
billion partial rows to keep ≤ 1/support of them; here the sketch pass
keeps O(1/support) state per partition, the candidate list rides a
broadcast-sized isin() filter PUSHED TO THE SCAN, and the verification
aggregate groups only candidate rows. ``txt_heavy_hitters`` (exact,
full groupBy) remains the right call at vocab-sized cardinality; this
is the long-tail-cardinality form.

Reference contrast: the reference's map→reduce can count keys
(worker.go:104-165) but always materializes EVERY key's count at the
reducers — the bounded-state pre-filter is exactly what its one-shot
contract cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items_verified(
    df: DataFrame, col: str, support: float = 0.01
) -> DataFrame:
    """(item, cnt, share) for every NON-NULL item whose exact frequency
    strictly exceeds ``support`` · N (N = non-NULL row count), derived
    through the freqItems sketch and exactness-verified as described in
    the module docstring. ``share`` = cnt / N as an exact double
    division (oracle-mirrorable bit-for-bit). Deterministic even though
    the sketch's false-positive tail is not: false positives fail the
    exact cut identically on every run."""
    if not 0.0 < support <= 1.0:
        raise ValueError(f"support must be in (0, 1], got {support}")
    rows = df.select(F.col(col).alias("item")).where(F.col("item").isNotNull())
    # one-row exact N — computed as an aggregate, not len(collect)
    n = rows.agg(F.count("*").alias("n"))
    # sketch pass: <= 1/support candidates, a driver-bounded list by the
    # algorithm's construction (the same bounded-collect class as
    # k-means' seed rows, operators/clustering.py)
    cands = rows.stat.freqItems(["item"], support).collect()[0][0]
    if not cands:
        # empty input (or support so high nothing can qualify): the
        # verified relation is empty with the same schema
        return (
            rows.groupBy("item")
            .agg(F.count("*").alias("cnt"))
            .crossJoin(F.broadcast(n))
            .where(F.lit(False))
            .select("item", "cnt", (F.col("cnt") / F.col("n")).alias("share"))
        )
    return (
        rows.where(F.col("item").isin(list(cands)))
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(n))
        .where(F.col("cnt") > F.lit(float(support)) * F.col("n"))
        .select(
            "item",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("share"),
        )
    )
