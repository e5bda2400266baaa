"""Skew mitigation: salted plans must be result-identical to plain ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_system_spark.operators import skew as SK


def skewed_df(spark):
    # one hot key (90% of rows) + a cold tail
    rows = [("hot", float(i), i) for i in range(900)] + [
        (f"cold{i % 10}", float(i), i) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v", "rid"])


def test_salted_agg_equals_plain(spark):
    df = skewed_df(spark)
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        r.k: (r.sum_value, r.cnt)
        for r in SK.salted_agg_sum_count(df, "k", "v", salt_src_col="rid", n_salts=16).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    df = skewed_df(spark)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col("rid")), F.lit(16)))
    per_salt = (
        salted.where(F.col("k") == "hot").groupBy("__salt").count().collect()
    )
    # the hot key's 900 rows must land on many salts, none dominating
    assert len(per_salt) > 8
    assert max(r["count"] for r in per_salt) < 900 * 0.25


def test_salted_join_equals_plain(spark):
    big = skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(10)], ["k", "tag"]
    )
    plain = sorted((r.rid, r.tag) for r in big.join(small, "k").collect())
    salted = sorted(
        (r.rid, r.tag)
        for r in SK.salted_join(big, small, key="k", salt_src_col="rid", n_salts=8).collect()
    )
    assert salted == plain and len(plain) == 1000


def test_salting_rejects_nonpositive_n_salts(spark):
    import pytest as _pytest

    from mapreduce_system_spark.operators.skew import salted_agg_sum_count, salted_join

    df = spark.createDataFrame([(1, 1.0)], "k long, value double")
    sm = spark.createDataFrame([(1, "x")], "k long, name string")
    with _pytest.raises(ValueError, match="n_salts"):
        salted_join(df, sm, "k", "k", n_salts=0)
    with _pytest.raises(ValueError, match="n_salts"):
        salted_agg_sum_count(df, "k", "value", "k", n_salts=0)
