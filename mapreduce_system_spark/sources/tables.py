"""Fixture-table catalog: explicit schemas + parquet loaders.

The reference has no schema system — its only type is ``string``
(``KeyValue{Key,Value string}``, ``worker.go:26-29``). This engine upgrades
to typed columnar tables: explicit ``StructType`` per fixture table (schema
inference is banned in the hot path — it costs an extra scan and can drift
between scale factors).

Scale notes: ``load_table`` takes an optional column list so callers prune
at the scan (ReadSchema pushdown); filters applied straight after load are
pushed into the parquet reader by Catalyst (check via
``plans.checks.pushed_filters``). region/nation/supplier are
broadcast-sized at every scale factor (FIXTURES.md) — join helpers broadcast
them explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The ten driver-generated tables (TESTDATA.md / FIXTURES.md).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan one fixture table; optionally prune columns at the scan.

    Equivalent of the reference's input scan (``worker.go:92-104``) upgraded
    from whole-text-file to columnar parquet: the `columns` projection and
    any subsequent `.filter` reach the parquet reader (column pruning +
    predicate pushdown) instead of materializing whole files in memory.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # DELIBERATE session-wide mutation, part of the catalog contract: the
    # NTZ→LTZ normalization below is only value-preserving when the
    # session timezone is UTC, and the driver calls queries() with its own
    # vanilla SparkSession that our bootstrap (session.py) never touched —
    # so the first load_table pins UTC (and is a no-op on every later call
    # via the guard). Any user code sharing a non-UTC session with this
    # catalog sees its timestamp parsing/formatting go UTC too; that is
    # the documented price of cross-engine-exact timestamps (README).
    # NOTE: conf.get(key) with NO default — passing a sentinel default
    # (e.g. "") is VALIDATED against the conf's type on unset sessions
    # and throws INVALID_CONF_VALUE on a vanilla driver session; both
    # keys have built-in defaults, so the no-default read is total.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default; shared with the streaming reader (stream_events) so
        # the two paths bind identical confs.
        ensure_events_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives as
    # LongType nanoseconds — floor to microseconds (identical to DuckDB's
    # internal truncation) and restore TimestampType.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # `div` is exact long division — float division corrupts ~1.6% of
        # microsecond values at 2024-epoch magnitudes (> 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = df.select(*[f.name for f in SCHEMAS["events"].fields])
    # Fixtures written with isAdjustedToUTC=false arrive as TIMESTAMP_NTZ
    # under Spark 4's NTZ inference. Normalize to TIMESTAMP (LTZ): the
    # session timezone is pinned to UTC so wall-clock values are unchanged,
    # streaming watermarks require LTZ event time, and one flavor across
    # every table keeps cross-table timestamp comparisons (as-of join)
    # cast-free regardless of how a given fixture generation wrote them.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    if columns:
        df = df.select(*columns)
    return df


def _parse_bytes(size: str) -> int:
    """Parse a Spark size conf value ('134217728', '128MB', '64m', '1g');
    covers every suffix Spark's own byte-conf parser accepts."""
    s = size.strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (
        ("k", 1 << 10),
        ("m", 1 << 20),
        ("g", 1 << 30),
        ("t", 1 << 40),
        ("p", 1 << 50),
    ):
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    return int(float(s) * mult)


def ensure_events_read_confs(spark: SparkSession) -> None:
    """The two runtime confs every events-fixture reader needs, batch OR
    streaming, in one place so the paths cannot drift (the r10 review
    found stream_events missing the UTC pin that load_table had): the
    NTZ→LTZ normalization is only value-preserving under a UTC session
    timezone, and TIMESTAMP(NANOS) parquet is rejected without
    nanosAsLong. Both are runtime-settable; the driver calls queries()
    with its own vanilla SparkSession, so these must bind here, not in
    the session bootstrap."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _opt_int_conf(spark, key: str):
    """Optional integer conf: None when unset (a None default skips the
    type validation that a sentinel string default can trip on some
    confs — see load_table's conf-read note)."""
    try:
        v = spark.conf.get(key, None)
    except Exception:
        return None
    try:
        return int(v) if v is not None else None
    except (TypeError, ValueError):
        return None


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to defaultParallelism when the scan has fewer input
    partitions than cores (single-file fixture parquet ⇒ 1 split).

    Heavy per-row work (shingle expressions, Arrow-batched Python) would
    otherwise run on one core. At production scale inputs already have
    ≥cores splits, so this is a no-op — the guard makes it safe to apply
    unconditionally at the head of expression-heavy operators.

    The split count is estimated from catalog metadata (input file sizes /
    ``maxPartitionBytes``) — no ``df.rdd`` conversion, which would build a
    throwaway physical plan per call just to read its partition count. The
    RDD probe remains only as the fallback for non-file relations."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = [f for f in df.inputFiles() if f.startswith("file:")]
    if files:
        import os
        from urllib.parse import unquote, urlparse

        try:
            sizes = [os.path.getsize(unquote(urlparse(f).path)) for f in files]
        except OSError:
            # file moved between planning and probe — fall through to the
            # RDD-partition probe rather than failing the query
            sizes = None
        if sizes is not None:
            max_pb = _parse_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            )
            open_cost = _parse_bytes(
                spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
            )
            # Spark's own FilePartition sizing: maxSplitBytes shrinks below
            # maxPartitionBytes when total/defaultParallelism is smaller, so
            # a mid-size file already splits to ~cores scan partitions —
            # estimating with maxPartitionBytes alone would call that
            # under-parallel and insert a pointless full shuffle. The
            # estimate must also respect FilePartition BIN-PACKING: many
            # tiny files coalesce into few partitions (ceil(total/split)),
            # so neither file count nor a per-file ceil sum is an upper
            # bound — take the min of the two formulations.
            total = sum(sizes) + open_cost * len(files)
            # Spark's denominator is minPartitionNum when set, else
            # leafNodeDefaultParallelism, else defaultParallelism — using
            # target alone diverges from the actual FilePartition sizing
            # when either conf is set and skips a needed repartition.
            denom = (
                _opt_int_conf(spark, "spark.sql.files.minPartitionNum")
                or _opt_int_conf(spark, "spark.sql.leafNodeDefaultParallelism")
                or target
            )
            # floor at 1 byte: openCostInBytes=0 (a legal tuning value)
            # with tiny inputs would otherwise make split 0 and the ceil
            # divisions below crash
            split = max(1, min(max_pb, max(open_cost, total // max(denom, 1))))
            per_file = sum(max(1, -(-s // split)) for s in sizes)
            packed = max(1, -(-total // split))
            return df if min(per_file, packed) >= target else df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
