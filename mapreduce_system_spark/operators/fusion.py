"""Reciprocal-rank fusion — combine heterogeneous retrieval rankings.

The standard late-fusion step of a hybrid retrieval stack (BM25 +
dense + anything): each system contributes ``1/(k0 + rank)`` for every
item on its list, items sum their contributions, and the fused order is
by that sum. RRF needs no score calibration across systems — only
ranks — which is exactly why production retrieval uses it (Cormack et
al., SIGIR'09: reciprocal rank fusion outperforms learned fusion on
uncalibrated inputs). Staged r13 for an r15 debut (``txt_rrf_fusion``
planned to fuse the registered BM25 ranking with a term-coverage
ranking over the same query set).

Float discipline for the SQL oracle: each contribution is the single
division ``1.0/(k0 + rank)`` of exact integers — bit-identical on both
engines — and a doc appears on ≤ n_systems lists, so with two systems
the fused score is a sum of at most TWO doubles (commutative, hence
order-deterministic); outputs are rounded anyway per registry.py.

100 TB posture: inputs are per-system TOP-K lists (queries × k rows —
list-sized, not corpus-sized; producing them is the upstream systems'
concern); fusion is one union + one (query, item) hash aggregate +
one per-query window over ≤ n_systems·k candidates per query. Nothing
here touches a corpus relation.

Reference contrast: worker.go:104-165's one-shot map→reduce can build
ONE ranking (that is ``mr_sort_topn``); fusing two requires meeting two
ranked relations on a composite key and re-ranking the sum — a second
round the reference cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query",
    item_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Fuse per-system rank lists into one RRF ranking.

    Each input DataFrame holds one system's list as
    ``(query, item, rank)`` with rank ≥ 1 (ties already broken by the
    producing system — RRF consumes a total order). Returns
    ``(query, item, rrf_score, fused_rank)`` where
    ``rrf_score = Σ_systems 1/(k0 + rank)`` over the lists the item
    appears on, and ``fused_rank`` orders by (score DESC, item ASC) —
    the deterministic tie-break that keeps the output a pure function
    of the inputs. ``top_k`` truncates per query after fusion. An item
    missing from a system's list simply contributes nothing (the RRF
    convention); duplicate (query, item) rows WITHIN one system are a
    caller bug this raises on (they would double-count that system).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    parts = [
        r.select(
            F.col(query_col).alias("query"),
            F.col(item_col).alias("item"),
            F.col(rank_col).cast("long").alias("rank"),
            F.lit(i).alias("sys"),
        )
        for i, r in enumerate(rankings)
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("query", "item").agg(
        F.sum(F.lit(1.0) / (F.lit(k0) + F.col("rank")).cast("double")).alias(
            "rrf_score"
        ),
        F.count("*").alias("n_rows"),
        F.count_distinct("sys").alias("n_sys"),
    )
    # duplicate (query, item) within one system ⇒ n_rows > n_sys; raise
    # at execution on the list-sized relation rather than silently
    # double-counting that system's vote
    checked = fused.select(
        "query",
        "item",
        F.when(
            F.col("n_rows") == F.col("n_sys"), F.col("rrf_score")
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "rrf_fuse: duplicate (query, item) within one system's "
                    "list — ranks must be a total order per system"
                )
            )
        )
        .alias("rrf_score"),
    )
    win = W.partitionBy("query").orderBy(F.desc("rrf_score"), F.asc("item"))
    out = checked.select(
        "query",
        "item",
        "rrf_score",
        F.row_number().over(win).alias("fused_rank"),
    )
    if top_k is not None:
        out = out.where(F.col("fused_rank") <= top_k)
    return out
