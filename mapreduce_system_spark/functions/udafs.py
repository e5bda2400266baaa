"""Custom aggregates (UDAF surface, SURVEY.md §2b).

The reference's ``reducef`` is a UDAF with the full-value-list contract
(worker.go:161-165) — honored by ``operators.mapreduce.per_key_fold`` /
``map_reduce``. Here is the *scalable* custom-aggregate path: Arrow-batched
``pandas_udf`` GROUPED_AGG, which Catalyst runs with partial batches per
group — constant driver memory, vectorized numpy inside.

UDFs are built lazily (``pandas_udf`` requires an active SparkSession, so
decorating at import time would break imports in session-less processes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def weighted_mean():
    """Σ(value·weight)/Σ(weight) GROUPED_AGG UDAF (call per session)."""

    @F.pandas_udf("double")
    def _weighted_mean(value: pd.Series, weight: pd.Series) -> float:
        w = weight.sum()
        return float((value * weight).sum() / w) if w else 0.0

    return _weighted_mean
