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
STATE_SCHEMA = "n long, n_vals long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, n_vals, total = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdfs:
        # deliberate SQL aggregate semantics, matching the batch twin
        # (stream_user_totals_batch oracle): n_events = count(*) counts
        # every row including null values; total = sum(value) skips
        # nulls. Pandas .sum() skips NaN like SQL SUM — EXCEPT over an
        # all-NaN series, where it returns 0.0 while SQL SUM returns
        # NULL; the non-null value count in state pins the SQL answer
        # (a user whose every value is NULL totals NULL, not a
        # fabricated 0.0).
        n += len(pdf)
        n_vals += int(pdf["value"].count())
        total += float(pdf["value"].sum())
    state.update((n, n_vals, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total if n_vals else None],
        }
    )


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


SESSION_OUTPUT_SCHEMA = "user_id long, session_start long, n_events long, dur_s long"
SESSION_STATE_SCHEMA = "start_es long, last_es long, n long"


def _make_session_updater(gap_s: int):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed last_es + gap with no new events: the open
            # session can never be extended — emit and evict. THIS is the
            # state bound: idle keys leave the store instead of living
            # forever (the running-totals demo's deliberate contrast).
            s, l, n = state.get
            closed.append((user_id, s, n, l - s))
            state.remove()
        else:
            # Interval-merge sweep: the restored open session is an
            # INTERVAL, not a point, so it enters the sorted sweep as
            # (start, last, n) alongside the batch's single-event
            # intervals. A point-vs-state loop would mishandle an
            # admitted late event that precedes the open session by MORE
            # than the gap (legal when the watermark delay exceeds the
            # gap): min(s, es) used to merge it, fabricating one session
            # spanning a silent gap — the sweep instead closes it as its
            # own earlier session. Exactly-gap-sized intervals still
            # merge (the session_window contract), and in-order replay
            # reduces to the plain append path.
            items: list[tuple[int, int, int]] = []
            for pdf in pdfs:
                items.extend((int(x), int(x), 1) for x in pdf["es"])
            if state.exists:
                items.append(tuple(state.get))
            items.sort()
            s, l, n = None, None, 0
            for a, b, k in items:
                if s is None:
                    s, l, n = a, b, k
                elif a - l > gap_s:
                    closed.append((user_id, s, n, l - s))
                    s, l, n = a, b, k
                else:
                    l, n = max(l, b), n + k
            state.update((s, l, n))
            # fire strictly after watermark passes last_es + gap: an event
            # at exactly last_es + gap still merges, so the timer sits at
            # +500 ms — past every merge-eligible instant, before the next
            # whole second a new-session event could occupy
            state.setTimeoutTimestamp((l + gap_s) * 1000 + 500)
        if closed:  # most calls close nothing — skip the empty Arrow batch
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in closed],
                    "session_start": [r[1] for r in closed],
                    "n_events": [r[2] for r in closed],
                    "dur_s": [r[3] for r in closed],
                }
            )

    return update


def user_sessions_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """CUSTOM stateful sessionization with event-time timeout eviction —
    the capability ``session_window`` cannot express when the per-session
    output needs arbitrary user logic (here: start/count/duration at
    close time, emitted exactly once).

    ``events`` must be a STREAMING DataFrame carrying a watermarked ``ts``
    (event time, drives the timers) and an ``es`` epoch-seconds column
    (what the session arithmetic uses — integer, hash-exact). Per user,
    state is one open session (start, last, count); batches extend or
    close it, and ``GroupStateTimeout.EventTimeTimeout`` closes + EVICTS
    idle sessions once the watermark passes last_es + gap — so the state
    store holds only OPEN sessions, the bound that makes this viable on
    an unbounded 100 TB/day feed. Closed sessions are appended exactly
    once.

    Exact batch parity (the registered query's oracle) additionally
    requires the arrival order to respect event time across batches —
    true for any watermark-disciplined source; the query's staging sorts
    its replay files to guarantee it.
    """
    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_updater(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
