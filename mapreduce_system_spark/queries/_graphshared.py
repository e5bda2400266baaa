"""Shared customer→supplier long-id node codec — NO query registrations.

``graph_pagerank`` (queries/fresh7d.py) and ``graph_pagerank_dangling``
(queries/fresh8a.py) iterate on LONG node ids — suppliers offset into
their own id space — because fixed-width 8-byte shuffle keys beat
variable-length strings on every per-round exchange (~15% wall at
sf0.1, and the margin grows with edge count); only the final
node-count-sized result maps to the oracles' string labels. This module
is the ONE definition of the offset, the edge construction, and the
label mapping: with two hand-copies, changing the offset or the label
scheme in one query but not the other would silently mislabel that
query's nodes against its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NODE_OFFSET = 1_000_000_000  # above any custkey at any fixture sf


def purchase_edges(orders: DataFrame, li: DataFrame) -> DataFrame:
    """Distinct directed (src=custkey, dst=suppkey+offset) long-id edges
    of the customer→supplier purchase graph."""
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + NODE_OFFSET).alias("dst"),
        )
        .distinct()
    )


def node_label(node: str = "node") -> Column:
    """'c<custkey>' / 's<suppkey>' string label of a long node id —
    the inverse of ``purchase_edges``'s encoding, spelled identically
    to the oracles' ``'c' || custkey`` / ``'s' || suppkey``."""
    c = F.col(node)
    return F.when(
        c >= NODE_OFFSET,
        F.concat(F.lit("s"), (c - NODE_OFFSET).cast("string")),
    ).otherwise(F.concat(F.lit("c"), c.cast("string")))
