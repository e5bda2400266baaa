"""Sources and sinks: round-trips and the whole-file scan contract."""

from __future__ import annotations

from pyspark.sql import types as T

from mapreduce_system_spark.sources import sinks, text
from mapreduce_system_spark.sources.tables import load_table


def test_partitioned_text_sink_roundtrip(spark, tmp_path):
    """The reference sink shape (worker.go:167): `key value` lines,
    hash-partitioned by key, readable back."""
    df = spark.createDataFrame([("b", 2), ("a", 1), ("c", 3)], ["k", "v"])
    out = str(tmp_path / "mr-out")
    sinks.write_partitioned_text(df, out, "k", "v", n_partitions=2)
    back = sorted(r.value for r in spark.read.text(out).collect())
    assert back == ["a 1", "b 2", "c 3"]


def test_parquet_sink_roundtrip_with_partitioning(spark, tmp_path):
    df = load_table(spark, "/root/testdata/sf0.001", "events", columns=["event_type", "value"])
    out = str(tmp_path / "pq")
    sinks.write_parquet(df, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # hive partitioning materialized → partition pruning available to readers
    assert any("event_type=" in str(p) for p in (tmp_path / "pq").iterdir())


def test_csv_sink_and_scan_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"])
    out = str(tmp_path / "csv")
    sinks.write_csv(df, out)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    back = text.read_csv(spark, out, schema=schema)
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_json_scan(spark, tmp_path):
    p = tmp_path / "j"
    p.mkdir()
    (p / "a.jsonl").write_text('{"id": 1, "s": "x"}\n{"id": 2, "s": "y"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    back = text.read_json(spark, str(p), schema=schema)
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_whole_text_files_contract(spark, tmp_path):
    """The reference's map input: one (filename, content) pair per file
    (worker.go:94-104)."""
    p = tmp_path / "txt"
    p.mkdir()
    (p / "f1.txt").write_text("alpha beta")
    (p / "f2.txt").write_text("gamma")
    df = text.whole_text_files(spark, str(p))
    got = {r.file.split("/")[-1]: r.content for r in df.collect()}
    assert got == {"f1.txt": "alpha beta", "f2.txt": "gamma"}


def test_read_text_lines_provenance(spark, tmp_path):
    p = tmp_path / "lines"
    p.mkdir()
    (p / "f.txt").write_text("l1\nl2\n")
    df = text.read_text_lines(spark, str(p))
    rows = df.collect()
    assert sorted(r.line for r in rows) == ["l1", "l2"]
    assert all(r.file.endswith("f.txt") for r in rows)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located (bucketed) fact-fact join: zero shuffle in the plan."""
    from mapreduce_system_spark.plans.checks import formatted_plan

    orders = load_table(spark, "/root/testdata/sf0.001", "orders", columns=["o_orderkey", "o_orderpriority"])
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem", columns=["l_orderkey", "l_extendedprice"])
    sinks.write_bucketed(orders, "t_orders_b", "o_orderkey", 4, str(tmp_path / "ob"))
    sinks.write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_li_b", "o_orderkey", 4, str(tmp_path / "lb"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_orders_b")
        b = spark.table("t_li_b")
        joined = a.join(b, "o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_ensure_parallelism_matches_actual_scan_packing(spark, tmp_path):
    """The metadata-based split estimate must agree with Spark's own
    FilePartition bin-packing: whenever the actual scan yields fewer
    partitions than cores the guard must repartition, and whenever the
    scan is already parallel it must NOT insert a shuffle. Many tiny
    files are the regression case — they pack into few partitions, so a
    file-count shortcut would skip the repartition the guard exists for."""
    from mapreduce_system_spark.sources.tables import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    for n_files in (1, 2, 8, 40):
        path = str(tmp_path / f"layout_{n_files}")
        spark.range(n_files * 10).repartition(n_files).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        actual = df.rdd.getNumPartitions()
        got = ensure_parallelism(df).rdd.getNumPartitions()
        if actual < target:
            assert got == target, (n_files, actual, got)
        else:
            assert got == actual, (n_files, actual, got)


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """The payoff of write_parquet(partition_by=...): joining the
    partitioned fact to a filtered dim on the partition column must plan
    a dynamicpruningexpression in the scan's PartitionFilters — at 100 TB
    that is the difference between scanning one partition and all of
    them, and it is free ONLY if the plan stays declarative."""
    from pyspark.sql import functions as F

    from mapreduce_system_spark.plans import checks

    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    sinks.write_parquet(ev, fact_path, partition_by=["event_type"])
    spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("purchase", 3.0)], "event_type string, w double"
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("w") >= 2.5)
    j = fact.join(dim, "event_type").groupBy("event_type").agg(F.count("*").alias("n"))
    plan = checks.formatted_plan(j)
    assert "dynamicpruningexpression" in plan, plan
    got = j.collect()
    assert [r.event_type for r in got] == ["purchase"]
    want = ev.where(F.col("event_type") == "purchase").count()
    assert got[0].n == want


def test_session_factory_sizes_codegen_cache_to_catalog(spark):
    """get_spark must carry the codegen-cache sizing (BASELINE_HISTORY §(o)): at
    the 100-entry default a 155-query catalog thrashes the generated-
    class cache and every repeated pass re-pays Janino + C2 warmup per
    stage (measured 190.9 → 153.1 s full-catalog median-of-3). The
    session fixture comes from get_spark, so reading the conf here pins
    the knob against accidental removal."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1024


def test_load_table_works_on_vanilla_session_confs(spark, sf_dir):
    """The driver imports __spark_entry__ with a VANILLA SparkSession —
    no timezone or nanosAsLong confs pre-set. newSession() reproduces
    that shape (fresh SQLConf over the shared context): load_table must
    self-pin its confs without touching a conf.get default (a sentinel
    default is type-VALIDATED on unset sessions and throws
    INVALID_CONF_VALUE — the round-6 regression this test pins)."""
    ns = spark.newSession()
    df = load_table(ns, sf_dir, "events", columns=["event_id", "ts"])
    assert df.count() > 0
    assert ns.conf.get("spark.sql.session.timeZone") == "UTC"
    assert ns.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    docs = load_table(ns, sf_dir, "documents", columns=["doc_id"])
    assert docs.count() > 0


def test_ensure_parallelism_survives_zero_open_cost(spark, tmp_path):
    """spark.sql.files.openCostInBytes=0 is a legal tuning value; with a
    tiny input it used to drive the estimated split size to 0 and crash
    the ceil division with ZeroDivisionError at the head of every
    mapper-heavy operator."""
    from mapreduce_system_spark.sources.tables import ensure_parallelism

    p = str(tmp_path / "tiny")
    spark.createDataFrame([(1,)], "x long").coalesce(1).write.parquet(p)
    prev = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        assert ensure_parallelism(spark.read.parquet(p)).count() == 1
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", prev)
