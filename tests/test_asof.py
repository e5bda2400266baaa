"""As-of join semantics: tie handling, no-match nulls, forward exclusion."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mapreduce_system_spark.operators import asof as ASOF


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-10T00:00:00")),  # after both r1 quotes → latest
            (2, "u1", ts("2024-01-05T00:00:00")),  # exactly at quote time → matches it
            (3, "u1", ts("2024-01-01T00:00:00")),  # before any quote → null
            (4, "u2", ts("2024-01-10T00:00:00")),  # key with no right rows → null
        ],
        ["id", "k", "t"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-03T00:00:00"), 30.0),
            ("u1", ts("2024-01-05T00:00:00"), 50.0),
        ],
        ["k", "rt", "price"],
    )
    out = ASOF.asof_join(left, right, on="k", left_time="t", right_time="rt", payload_cols=["price"])
    got = {r.id: r.price for r in out.collect()}
    assert got == {1: 50.0, 2: 50.0, 3: None, 4: None}


def test_latest_per_key_time_dedup(spark):
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 1, 20), ("k", 2, 5)], ["key", "t", "tb"]
    )
    got = sorted((r.t, r.tb) for r in ASOF.latest_per_key_time(df, "key", "t", "tb").collect())
    assert got == [(1, 20), (2, 5)]


def test_range_join_bands(spark):
    fact = spark.createDataFrame([(5.0,), (25.0,), (25.0,), (99.0,)], ["v"])
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 100.0)], ["band", "lo", "hi"]
    )
    out = ASOF.range_join(fact, bands, "v").groupBy("band").agg(F.count("*").alias("c"))
    assert {r.band: r.c for r in out.collect()} == {"lo": 1, "hi": 3}


def test_asof_join_null_keys_and_times_never_match(spark):
    """ASOF predicates (key equality, right_time <= left_time) are never
    true for NULL: null-key/null-time right rows match nothing, and
    null-key left rows keep a NULL payload."""
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t("2024-01-01T10:00:00")), (None, t("2024-01-01T10:00:00"))],
        "k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t("2024-01-01T09:00:00"), "match"),
            (None, t("2024-01-01T08:00:00"), "null-key"),
            (1, None, "null-time"),
        ],
        "k long, rt timestamp, payload string",
    )
    out = {
        (r.k, r.payload)
        for r in ASOF.asof_join(left, right, on="k", left_time="lt", right_time="rt", payload_cols=["payload"]).collect()
    }
    assert out == {(1, "match"), (None, None)}
