"""Skew mitigation: salted aggregation and salted joins.

At 100 TB, zipfian keys turn one reducer into the job's critical path —
the classic MapReduce failure mode (the reference has no combiner at all,
README.MD:31-38, so *every* hot-key pair lands on one reduce worker).
Spark's AQE skew-join splitting handles joins at runtime; these operators
are the explicit, planner-independent formulations:

- ``salted_agg_sum_count``: two-phase aggregation — phase 1 groups on
  (key, salt) spreading a hot key over ``n_salts`` reducers, phase 2
  re-aggregates the per-salt partials. Correct for any algebraic
  aggregate (sum/count here; avg = sum/count downstream).
- ``salted_join``: replicates the small side ``n_salts``× (explode) and
  salts the big side deterministically, so one hot join key fans out to
  ``n_salts`` tasks. Exact same join result, bounded per-task fan-in.

Salt assignment is deterministic (xxhash64 of a supplied column), keeping
results reproducible — no ``rand()`` in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_absent(df: DataFrame, *names: str) -> None:
    """Refuse to shadow caller columns with internal temp names: silently
    replacing (withColumn) and later dropping them would lose caller data."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(f"input already has internal column(s) {clash}")


def salted_agg_sum_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_src_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) sum/count per key: (key, sum_value, cnt).

    Phase 1 shuffles on (key, salt) — a key with R rows sends ≤ R/n_salts
    rows to any single reducer; phase 2 shuffles n_salts rows per key.
    """
    if n_salts < 1:
        # pmod(x, 0) is NULL and an empty replication array drops rows —
        # a dynamic n_salts of 0 must fail loudly, not lose data silently
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    _require_absent(df, "__salt", "__s", "__c")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts)))
    partial = salted.groupBy(key_col, "__salt").agg(
        F.sum(value_col).alias("__s"), F.count("*").alias("__c")
    )
    return partial.groupBy(key_col).agg(
        F.sum("__s").alias("sum_value"), F.sum("__c").alias("cnt")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Result ≡ ``big.join(small, key)``; the per-key fan-in of any single
    task drops by n_salts at the cost of shuffling the small side
    n_salts×. Use when one side is hot-keyed but too large to broadcast
    (otherwise prefer ``broadcast`` or AQE's runtime skew split).
    """
    if n_salts < 1:
        # same loud-failure contract as salted_agg_sum_count: n_salts=0
        # would return an EMPTY join (NULL salts match nothing) — silent
        # loss of every matching row
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    _require_absent(big, "__salt")
    _require_absent(small, "__salt")
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src_col)), F.lit(n_salts)))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return big_s.join(small_r, [key, "__salt"]).drop("__salt")
