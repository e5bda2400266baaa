"""As-of and range (band) joins — no Spark builtin; composed from
primitives (SURVEY.md §7 P4, the one genuinely hard reference-absent op).

``asof_join`` uses the union + partitioned-window formulation:

1. tag right rows (carry payload) and left rows (payload null), union;
2. one window per key ordered by (time, right-first at ties);
3. ``last(struct(payloads), ignoreNulls=True)`` over
   unbounded-preceding..current propagates the most recent right row's
   payload struct forward (a single struct, so a NULL field inside the
   matched row is preserved rather than filled from an older row);
4. keep left rows, unpack the struct.

This is one shuffle on the join key + one per-partition sort — the same
cost as a sort-merge join, with per-key (not global) ordering, so it
scales like any keyed window. Equal timestamps match (right sorts before
left at ties), i.e. ``right_time <= left_time`` semantics — identical to
DuckDB/kdb ASOF JOIN, which the oracle uses.

SKEW: the window partitions by the join key, so ONE hot key (one
instrument carrying half the ticks) lands on one task at 100× scale.
``asof_join_salted`` is the two-phase remedy: left rows spread over
n_salts sub-partitions, right rows replicated to every salt — per-task
work drops to left/n_salts + right per key, at the cost of an n_salts×
replication of the (smaller) right side. Same trade as
``operators.skew.salted_join``; result parity is pinned in
tests/test_asof.py AND re-asserted by checksum inside the skew probe.

MEASURED CROSSOVER (tools/scale_probe.py --asof, r11,
bench_runs/scale_probe_r11_asof{,50}.json, local[32]): with one key
holding 18% of a 1M-row left side both forms sit on the fixed-cost
floor (plain 1.17 s vs salted 1.27 s — salting pays its ~8-40% right-
replication overhead for nothing); with one key holding 29% of a
5M-row left side the plain window's single hot-key task dominates the
stage (0.67 → 4.29 s, wall ×6.4 at rows ×50) while the salted form
tracks total input (0.94 → 1.89 s, ×2.01) — 2.3× faster, identical
results. Rule of thumb from the two records: salt when the hottest
key's left depth approaches ~one task's worth of rows (≳10% of a
local stage's input, or ≳1 partition's rows on a cluster); below that
the plain window wins on overhead.

``range_join`` joins a fact column into literal bands via broadcast —
Catalyst plans BroadcastNestedLoopJoin with the band predicate, which is
the right physical plan when the band table is small (always, for bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _require_payload_names_free(
    left: DataFrame, payload_cols: list[str], extra: tuple[str, ...] = ()
) -> None:
    """Refuse payload/output names that already exist on the left side:
    the final ``select('__left.*', payload…)`` would silently emit
    duplicate column names, failing only at the first downstream
    reference or write, far from the cause (the same posture
    ``asof_join_salted``'s ``_require_absent`` takes for its internal
    names). Alias the colliding columns on one side first."""
    dup = [c for c in [*payload_cols, *extra] if c in left.columns]
    if dup:
        raise ValueError(
            f"asof join: payload/output column(s) {dup} already exist on "
            "the left side — alias them before joining"
        )


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_struct: F.Column,
) -> DataFrame:
    """The tag-union scaffolding shared by ``asof_join`` and
    ``asof_join_nearest``: (__k, __t, __r, __left, __p) rows where right
    rows carry ``payload_struct`` as ``__p`` (payload null on left rows)
    and left rows carry their full row struct as ``__left``. One
    definition so a NULL-semantics or schema fix applies to both
    variants at once.

    NULL semantics, matching DuckDB/kdb ASOF exactly: the join's
    equality and <=/nearest predicates are never true for NULL, so a
    right row with a NULL key or NULL time can match nothing — drop it
    up front. (Without the filter, Window.partitionBy groups NULL keys
    together and a NULL right_time sorts first, silently attaching
    payloads that ASOF semantics would leave NULL.) Left rows with NULL
    key/time are kept with NULL payload.

    Payloads are propagated as ONE non-null struct, not per-column
    last(ignorenulls): with per-column fill, a matched right row whose
    payload field is legitimately NULL would be skipped and an *older*
    row's non-null value would leak through — diverging from DuckDB/kdb
    ASOF semantics, which take all fields from the single matched row.
    """
    right = right.where(F.col(on).isNotNull() & F.col(right_time).isNotNull())
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__r"),
        F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema]
        ).alias("__left"),
        payload_struct.alias("__p"),
    )
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__r"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(rt.schema["__p"].dataType).alias("__p"),
    )
    return lt.unionByName(rt)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right payload with
    ``right[right_time] <= left[left_time]`` within the same ``on`` key.

    ``right`` must be unique per (on, right_time) — pre-aggregate ties
    first (see ``latest_per_key_time``) to keep results deterministic.
    Returns all left columns + payload_cols (null when no prior right row).
    NULL semantics: see ``_tagged_union``.
    """
    _require_payload_names_free(left, payload_cols)
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__r").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = _tagged_union(
        left, right, on, left_time, right_time, F.struct(*payload_cols)
    ).select(
        "__r",
        "__left",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.where(F.col("__r") == 0).select(
        "__left.*", *[F.col("__p")[c].alias(c) for c in payload_cols]
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    salt_src_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant ``asof_join``: identical semantics, bounded task size.

    Left rows hash into ``n_salts`` sub-partitions by ``salt_src_col`` (any
    well-distributed left column — a row id); right rows are replicated to
    every salt (broadcast of a salt range → n_salts× the right side, the
    deliberate trade). Each (key, salt) window then contains ~1/n_salts of
    the hot key's left rows plus all its right rows, so no single task
    owns the whole hot key.

    NULL handling matches ``asof_join`` exactly: right rows with NULL
    key/time are dropped BEFORE the composite key is built (a struct key
    is never null, so the inner filter would otherwise let NULL-key right
    rows meet NULL-key left rows); left NULL-key rows keep NULL payloads
    because their partitions contain no right rows.
    """
    from mapreduce_system_spark.operators.skew import _require_absent

    # refuse to shadow caller columns with the internal temp names — the
    # withColumn + final drop would silently lose caller data (the same
    # guard skew.py applies to its salted operators)
    _require_absent(left, "__salt", "__sk")
    _require_absent(right, "__salt", "__sk")
    spark = left.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    right_ok = right.where(F.col(on).isNotNull() & F.col(right_time).isNotNull())
    l2 = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts)).cast("int")
    ).withColumn("__sk", F.struct(F.col(on), F.col("__salt")))
    r2 = right_ok.crossJoin(F.broadcast(salts)).withColumn(
        "__sk", F.struct(F.col(on), F.col("__salt"))
    )
    out = asof_join(l2, r2, "__sk", left_time, right_time, payload_cols)
    return out.drop("__salt", "__sk")


def latest_per_key_time(
    df: DataFrame, key: str, time_col: str, tiebreak: str
) -> DataFrame:
    """Deduplicate to one row per (key, time): max-tiebreak survivor."""
    w = W.partitionBy(key, time_col).orderBy(F.col(tiebreak).desc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band join: fact rows matched to [lo, hi) intervals (broadcast)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond)


def _time_as_long(col: F.Column, dtype: str) -> F.Column:
    """Exact integer image of a time column for gap comparison: epoch
    micros for every temporal type, the raw value for integral types.
    Gaps are compared as longs, never doubles — a double epoch loses µs
    precision at 2024-scale magnitudes and would flip near-tie decisions.

    date and timestamp_ntz go through a cast to timestamp first:
    ``unix_micros`` accepts neither directly (date→bigint casts are
    forbidden outright), and routing all three temporal types to one
    epoch-micros image keeps a date left side comparable with a
    timestamp right side. Under the engine's pinned UTC session the
    cast is the identity interpretation.
    """
    if dtype == "date" or dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("long")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Nearest-in-time as-of join (pandas ``merge_asof(direction=
    'nearest')``): attach the right payload minimizing
    ``|right_time − left_time|`` within the key; equal distances prefer
    the backward (``right_time <= left_time``) match.

    Built as the backward and forward propagations over ONE union of
    the tagged streams: the same keyed window partition evaluated under
    ascending and descending time order (one exchange, two sorts), then
    a per-row pick by exact integer gap. Same preconditions and NULL
    semantics as ``asof_join`` (shared ``_tagged_union``); scales
    identically (keyed window, no self-join).
    """
    _require_payload_names_free(left, payload_cols, extra=("__matched_time_long",))
    rt_type = dict(right.dtypes)[right_time]
    lt_type = dict(left.dtypes)[left_time]
    tagged = _tagged_union(
        left,
        right,
        on,
        left_time,
        right_time,
        F.struct(
            _time_as_long(F.col(right_time), rt_type).alias("__rt_us"),
            *payload_cols,
        ),
    )
    # backward: ascending time, right-before-left at ties (<= semantics);
    # forward: descending time, right-before-left at ties (>= semantics)
    w_b = (
        W.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__r").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_f = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__r").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = tagged.select(
        "__r",
        "__left",
        _time_as_long(F.col("__t"), lt_type).alias("__lt_us"),
        F.last("__p", ignorenulls=True).over(w_b).alias("__pb"),
        F.last("__p", ignorenulls=True).over(w_f).alias("__pf"),
    )
    gap_b = F.col("__lt_us") - F.col("__pb.__rt_us")
    gap_f = F.col("__pf.__rt_us") - F.col("__lt_us")
    pick_backward = F.col("__pb").isNotNull() & (
        F.col("__pf").isNull() | (gap_b <= gap_f)
    )
    # NULL left_time ⇒ NULL payload (|r - NULL| is not a distance): the
    # backward window (asc, nulls first) naturally sees no right rows,
    # but the FORWARD window (desc) sorts NULLs last and would see every
    # right row — unguarded, a NULL-time left row walked away with the
    # earliest right payload, diverging from asof_join and the oracle
    chosen = F.when(
        F.col("__lt_us").isNotNull(),
        F.when(pick_backward, F.col("__pb")).otherwise(F.col("__pf")),
    )
    return (
        filled.where(F.col("__r") == 0)
        .select("__left", chosen.alias("__c"))
        .select(
            "__left.*",
            *[F.col("__c")[c].alias(c) for c in payload_cols],
            F.col("__c.__rt_us").alias("__matched_time_long"),
        )
    )
