"""Registered sink round-trip query: partitioned parquet + pruned re-scan.

The reference's sink contract (partitioned files + atomic rename commit,
worker.go:154-170 / coordinator.go:50-79) is exercised by pytest round
trips and by ``mr_whole_text_files_wc`` (text sink → wholeTextFiles). This
query puts the *columnar* sink on the driver's correctness record too:
write orders hive-partitioned by priority, re-scan with a partition
filter, aggregate — and the re-scan must touch only the two selected
partition directories (partition pruning, asserted in
tests/test_sinks_query.py). The oracle computes the same aggregate
straight from the source table, so the round trip proves write+read
preserve values exactly.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.sinks import write_parquet
from mapreduce_system_spark.sources.tables import load_table

_PRIORITIES = ("1-URGENT", "2-HIGH")

_SINK_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderpriority IN ('{_PRIORITIES[0]}', '{_PRIORITIES[1]}')
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


def partitioned_sink_path(sf_dir: str) -> str:
    return f"/tmp/spark_graft_sink_orders_{Path(sf_dir).name}"


@register("sink_partitioned_roundtrip", _SINK_SQL)
def q_sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink round trip with pruned re-scan.

    Write side: one directory per o_orderpriority (the layout that gives
    100 TB readers partition pruning for free); FileOutputCommitter's
    tmp+rename is the reference's atomic commit. Read side: the IN filter
    on the partition column becomes a PartitionFilters entry — only 2 of 5
    directories are listed/scanned, no row-level filtering at all."""
    orders = load_table(
        spark, sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    path = partitioned_sink_path(sf_dir)
    write_parquet(orders, path, partition_by=["o_orderpriority"])
    back = spark.read.parquet(path).where(F.col("o_orderpriority").isin(*_PRIORITIES))
    return (
        back.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )
