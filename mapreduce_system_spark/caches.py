"""Tracked ``.cache()`` registry so long-lived sessions can release them.

Operators that cache an intermediate (e.g. the shingle sets in
``operators.dedup``) return *lazy* plans — the cache cannot be unpersisted
inside the operator because nothing has executed yet. Registering every
cached relation here lets harnesses that run many queries in one session
(bench.py, the driver's correctness sweep, pytest) call ``release()``
between queries, so cached relations never accumulate across the run.

Unreleased entries are bounded by the corpus the operator cached (a few
MB at fixture scale) and are dropped with the session; ``release()`` makes
the bound zero for harnesses that care.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` that registers the relation for later ``release()``."""
    cached = df.cache()
    _TRACKED.append(cached)
    return cached


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-cached relation for later ``release()`` (for
    iterative operators that cache per-round state themselves and only
    hand over the surviving relation)."""
    _TRACKED.append(df)
    return df


def release() -> int:
    """Unpersist every tracked cached relation; returns how many."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
