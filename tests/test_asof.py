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


def test_asof_join_salted_parity_on_skewed_keys(spark, sf_dir):
    """The salted two-phase asof must equal the plain asof row-for-row —
    on the real fixture (events asof orders per user) AND on a synthetic
    hot-key distribution (90% of left rows on one key) with null edges."""
    from mapreduce_system_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = load_table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    latest = ASOF.latest_per_key_time(orders, "o_custkey", "o_orderdate", "o_totalprice")
    r = latest.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("rt"),
        "o_totalprice",
    )
    plain = ASOF.asof_join(
        ev, r, on="user_id", left_time="ts", right_time="rt", payload_cols=["o_totalprice"]
    )
    salted = ASOF.asof_join_salted(
        ev, r, on="user_id", left_time="ts", right_time="rt",
        payload_cols=["o_totalprice"], salt_src_col="event_id", n_salts=4,
    )
    p = sorted((r.event_id, r.o_totalprice) for r in plain.collect())
    s = sorted((r.event_id, r.o_totalprice) for r in salted.collect())
    assert p == s and len(p) > 0

    # synthetic hot key + null key/time rows on both sides
    hot = [(i, 1 if i % 10 else None, float(i % 97)) for i in range(1000)]
    left = spark.createDataFrame(hot, "id long, k long, lt double")
    right = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 500.0, "b"), (2, 0.0, "c"), (None, 5.0, "n"), (1, None, "t")],
        "k long, rt double, payload string",
    )
    plain2 = ASOF.asof_join(left, right, "k", "lt", "rt", ["payload"])
    salted2 = ASOF.asof_join_salted(
        left, right, "k", "lt", "rt", ["payload"], salt_src_col="id", n_salts=8
    )
    p2 = sorted((r.id, r.payload) for r in plain2.collect())
    s2 = sorted((r.id, r.payload) for r in salted2.collect())
    assert p2 == s2 and len(p2) == 1000


def test_asof_nearest_semantics(spark):
    """Nearest match each direction, backward preferred on exact ties,
    NULL payload when the key has no right rows at all."""
    from mapreduce_system_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 21, "b"), (1, 35, "c"), (2, 5, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 12, 100), (1, 20, 200), (1, 30, 300)], ["k", "t", "payload"]
    )
    out = {
        r.tag: (r.payload, r["__matched_time_long"])
        for r in asof_join_nearest(
            left, right, on="k", left_time="t", right_time="t",
            payload_cols=["payload"],
        ).collect()
    }
    assert out["a"] == (100, 12)   # forward-only nearest (no prior right row)
    assert out["b"] == (200, 20)   # backward 1 vs forward 9 — backward
    assert out["c"] == (300, 30)   # backward 5 — nearest overall
    assert out["d"] == (None, None)  # key 2 has no right rows


def test_asof_nearest_exact_tie_prefers_backward(spark):
    from mapreduce_system_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame([(1, 20)], ["k", "t"])
    right = spark.createDataFrame([(1, 15, "back"), (1, 25, "fwd")], ["k", "t", "p"])
    row = asof_join_nearest(
        left, right, on="k", left_time="t", right_time="t", payload_cols=["p"]
    ).collect()[0]
    assert row.p == "back"


def test_asof_nearest_single_exchange(spark):
    """Both direction passes must share the one keyed exchange — the
    operator's scale claim (a second shuffle would double the cost of
    the dominant stage at corpus scale)."""
    from mapreduce_system_spark.operators.asof import asof_join_nearest
    from mapreduce_system_spark.plans.checks import formatted_plan

    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame([(1, 12, 1.0)], ["k", "t", "p"])
    plan = formatted_plan(
        asof_join_nearest(left, right, on="k", left_time="t", right_time="t", payload_cols=["p"])
    )
    tree = plan.split("\n\n")[0]
    n_shuffles = sum(
        1 for line in tree.splitlines() if "Exchange" in line and "Broadcast" not in line
    )
    assert n_shuffles <= 2, plan  # union-side partitioning; no per-direction extra


def test_asof_nearest_null_left_time_keeps_null_payload(spark):
    """A left row with NULL time has no distance to any right row — it
    must get a NULL payload, exactly like asof_join. The forward
    (descending) window sorts NULLs last, so unguarded it saw every
    right row and attached the EARLIEST payload to NULL-time rows."""
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [("u1", t("2024-01-01T10:00:00")), ("u1", None)], "k string, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u1", t("2024-01-01T09:00:00"), 4.0),
            ("u1", t("2024-01-01T11:00:00"), 9.0),
        ],
        "k string, rt timestamp, price double",
    )
    out = {
        (r.lt, r.price)
        for r in ASOF.asof_join_nearest(
            left, right, on="k", left_time="lt", right_time="rt", payload_cols=["price"]
        ).collect()
    }
    assert out == {(t("2024-01-01T10:00:00"), 4.0), (None, None)}


def test_asof_salted_rejects_internal_column_clash(spark):
    """Caller columns named __salt/__sk must be rejected, not silently
    overwritten and dropped (the skew.py _require_absent contract)."""
    import datetime as dt

    import pytest

    now = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame([(1, now, 7)], "k long, lt timestamp, __salt int")
    right = spark.createDataFrame([(1, now, 1.0)], "k long, rt timestamp, p double")
    with pytest.raises(ValueError, match="__salt"):
        ASOF.asof_join_salted(
            left, right, on="k", left_time="lt", right_time="rt",
            payload_cols=["p"], salt_src_col="k",
        )


def test_asof_nearest_supports_date_time_columns(spark):
    """asof_join_nearest on DATE columns (the type queries/temporal.py
    feeds plain asof_join) — the long image must go through a timestamp
    cast, not a forbidden date→bigint cast (r10 review)."""
    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10))], "k int, d date"
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 10.0), (1, dt.date(2024, 1, 12), 99.0)],
        "k int, rd date, price double",
    )
    got = ASOF.asof_join_nearest(left, right, "k", "d", "rd", ["price"]).collect()
    assert len(got) == 1 and got[0].price == 99.0  # 2 days forward beats 9 back


def test_asof_join_rejects_colliding_payload_names(spark):
    """A payload column that already exists on the left would emit
    duplicate output columns that fail far downstream (r10 review)."""
    import pytest

    left = spark.createDataFrame([(1, 5, 1.0)], "k int, t int, price double")
    right = spark.createDataFrame([(1, 3, 2.0)], "k int, rt int, price double")
    with pytest.raises(ValueError, match="price"):
        ASOF.asof_join(left, right, "k", "t", "rt", ["price"])
    with pytest.raises(ValueError, match="price"):
        ASOF.asof_join_nearest(left, right, "k", "t", "rt", ["price"])
