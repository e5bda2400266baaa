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


_TRACKED_RDDS: list[tuple[object, frozenset[int]]] = []


def persistent_rdd_ids(spark) -> set[int]:
    """Ids of the RDDs currently persisted in the context — including
    ``localCheckpoint`` blocks, which ``DataFrame.unpersist()`` can NOT
    release (the checkpoint's storage belongs to an internal RDD the
    DataFrame API never exposes). Iterative operators snapshot this
    before/after a checkpoint to learn the ids they created; the diff is
    only meaningful while one operator checkpoints at a time (true for
    every harness here — bench/verify/driver run queries serially)."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def unpersist_rdd_ids(spark, ids) -> int:
    """Release the storage of the given persisted-RDD ids (non-blocking).
    A locally-checkpointed RDD is unusable afterwards — callers must only
    release rounds whose successors are already materialized."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(False)
            n += 1
    return n


def track_rdd_ids(spark, ids) -> None:
    """Register checkpoint-block RDD ids for the next ``release()`` —
    the checkpoint analog of ``track`` for cached DataFrames."""
    _TRACKED_RDDS.append((spark, frozenset(ids)))


def release() -> int:
    """Unpersist every tracked cached relation; returns how many."""
    n = 0
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    while _TRACKED_RDDS:
        spark, ids = _TRACKED_RDDS.pop()
        try:
            n += unpersist_rdd_ids(spark, ids)
        except Exception:  # session already stopped — nothing to release
            pass
    return n


def reap_stale_stagings(prefix: str, keep: str, max_age_s: int = 48 * 3600) -> None:
    """Remove sibling /tmp staging dirs abandoned by DEAD applications.

    One definition of the deletion policy for every per-application
    staging family (whole-text-files, sink round-trips, the stateful
    stream scratch dirs) — two drifting copies of a deletion policy is
    how a live session's staging gets reaped mid-read. The 48 h cutoff
    is safe because a LIVE application re-overwrites (or has just
    created) its own staging, so only abandoned dirs age past it;
    ``keep`` (the current run's dir name) is never reaped regardless of
    age.

    ``prefix`` is a LITERAL directory-name prefix (typically embedding
    the sf-dir name) — it is glob-escaped here, so metacharacters in an
    sf-dir name ('*', '[') can never widen the match beyond the
    intended staging family before the rmtree.
    """
    import glob as _glob
    import shutil
    import time
    from pathlib import Path

    for d in Path("/tmp").glob(_glob.escape(prefix) + "*"):
        try:
            if d.name != keep and time.time() - d.stat().st_mtime > max_age_s:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass
