"""The md5-derived deterministic-uniform primitive, single-sourced.

Every hash-derived split / sample / fold / checksum query uses the same
32-bit uniform: the first 8 hex digits of md5 read as an integer in
[0, 2^32). It must be spelled identically in the Spark plan and in the
DuckDB oracle (and identically across the split queries themselves —
train/test membership must come from ONE function of the key, or the
splits stop partitioning the corpus). These two helpers are that one
spelling; a width or cast tweak lands on every consumer at once instead
of silently desynchronizing one of seven hand-copies.

Determinism across retries/partitionings is the point: md5 of the key
is reproducible anywhere, unlike rand() or monotonically_increasing_id
(reference worker.go:35-41 hashes keys for the same
stable-assignment reason).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket32(col: Column | str) -> Column:
    """BIGINT uniform in [0, 2^32) from the first 8 md5 hex digits of a
    STRING column/expression (callers cast non-string keys themselves so
    the cast is visible next to the key choice). Compose ``% n`` for
    buckets/folds, ``(x + 1) / 2**32`` for a (0, 1] uniform."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_bucket32_sql(expr: str) -> str:
    """The DuckDB spelling of ``md5_bucket32`` over a SQL expression —
    interpolate into oracle CTEs. UBIGINT (not BIGINT) so the 32-bit
    value never reads as negative; wrap in CAST(... AS BIGINT) only when
    the projected column itself must be BIGINT for schema parity."""
    return f"('0x' || substr(md5({expr}), 1, 8))::UBIGINT"
