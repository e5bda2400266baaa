"""Partitioned sinks with atomic commit.

The reference's sink writes ``"key value\\n"`` lines to per-partition tmp
files which the single-committer coordinator renames to ``mr-out-<R>`` only
after completion (``worker.go:154-170``, ``coordinator.go:50-79``,
README.MD:98-102). Hadoop's FileOutputCommitter (v1) used by every
``df.write`` implements exactly that tmp-directory + rename protocol, so
atomicity/idempotence under task retry is inherited, not re-built.

Scale notes: `n_partitions` maps to the reference's `nReduce` (one output
file per reduce partition, README.MD:72). For 100 TB outputs prefer
`write_parquet` with `partition_by` (hive-style partition pruning for
readers) and never `coalesce(1)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_text(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    n_partitions: int | None = None,
    sep: str = " ",
) -> None:
    """Reference-shaped text sink: `key value` lines, one file per partition.

    Mirrors `mr-out-<R>` (``worker.go:167``: space-separated line per KV;
    hash-partitioned by key per ``worker.go:107-110``; sorted within each
    partition per ``worker.go:153``).
    """
    # NULLs are coalesced to empty strings BEFORE concat: concat_ws would
    # silently drop a null field, leaving a line with no separator that
    # re-parsers can't distinguish from a bare key. With the coalesce the
    # separator always appears and the KV field structure survives.
    k_str = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    v_str = F.coalesce(F.col(value_col).cast("string"), F.lit(""))
    out = df.select(
        F.concat_ws(sep, k_str, v_str).alias("value"),
        F.col(key_col).alias("__k"),
    )
    if n_partitions is not None:
        if n_partitions < 1:
            raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
        out = out.repartition(n_partitions, "__k")
    else:
        # the mr-out contract (worker.go:107-110) hash-partitions by key —
        # a key must land in exactly ONE output file even when the caller
        # doesn't fix the partition count
        out = out.repartition(F.col("__k"))
    out.sortWithinPartitions("__k").select("value").write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """CSV sink, option-matched to ``text.read_csv`` (see its docstring
    for the measured roundtrip classes and the one documented ``'\\N'``
    sentinel residual): the writer's whitespace-stripping defaults are
    OFF (they corrupt ' padded ' values), quotes escape RFC-4180 style,
    and NULL/'' write distinguishably."""
    (
        df.write.mode(mode)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .csv(path, header=header)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted external table — the co-located join layout.

    Two tables bucketed on the same key with the same bucket count join
    with ZERO exchange (each bucket pair is a task): the pre-shuffled
    layout a 100 TB fact-fact join should be stored in. Asserted in
    tests/test_sources.py::test_bucketed_join_has_no_exchange.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
