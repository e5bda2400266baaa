"""Custom stateful streaming operators via applyInPandasWithState.

The engine-side analog of the reference's reduce contract for streams:
user state folds value batches per key across micro-batches (the
reference's ``reducef`` sees the whole value list at once,
worker.go:161-165; a stream can't, so state carries the partial fold).

Arrow moves the per-group batches (Pandas DataFrames), never pickled rows.
State size is O(keys) — at 100 TB/day the watermark-driven timeout (GST's
``oldTimeoutTimestamp``) must evict idle keys; here the running-totals
demo keeps state forever by design (bounded key space).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        # deliberate SQL aggregate semantics, matching the batch twin
        # (stream_user_totals_batch oracle): n_events = count(*) counts
        # every row including null values; total = sum(value) skips nulls
        # (pandas .sum() ignores NaN exactly like SQL SUM ignores NULL).
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    Emits the updated totals for every user seen in the current batch
    (update-mode semantics).
    """
    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
