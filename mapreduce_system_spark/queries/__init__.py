"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``registry.py`` itself.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round or have never received a driver CORRECTNESS row are
imported first; everything pushed past the window has a driver-green row
from CORRECTNESS_r03/r04.

Round-6 window (9 registry-core queries precede these, positions 1-9),
executing VERDICT.md r5 #1: rotate the stale-evidence modules in —

- fresh6 (2 NEW r6 queries: stream_stateful_user_totals and
  stream_stateful_sessions — the applyInPandasWithState operator driven
  through real streams, accumulation AND timeout-eviction halves) →
  10-11;
- temporal (7, r03-era rows — oldest evidence in the catalog, two
  fixture regenerations old) → 12-18;
- advanced (7, r04 rows; agg_approx_quantiles' anchor was reworked r5
  and agg_quantiles rebuilt as rank-based selection r6 — both need
  fresh driver rows) → 19-25;
- multimodal (5, r04 rows; re-pin under the r5/r6 decoder-seam
  refactors) → 26-30;
- similarity (8, r04 rows) → 31-38;
- relational (first 12 of 18) → 39-50.

Out of window this round, ALL driver-green r05 (fresh/dedup/streaming/
pipeline/textstats/sinks) or r04 (relational's last 6 by registration
order — agg_distinct_stats, agg_approx_distinct, agg_star_pricing,
rel_full_outer_join, rel_pivot_priority_revenue, rel_unpivot_metrics —
none changed since their r04 rows).
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh6,        # NEW r6: stream_stateful_user_totals (applyInPandasWithState)
    temporal,      # r03 rows — oldest evidence, rotate first
    advanced,      # r04 rows + r5/r6 quantile reworks needing driver re-pin
    multimodal,    # r04 rows + decoder-seam refactor re-pin
    similarity,    # r04 rows
    relational,    # r04 rows (first 13 in window)
    fresh,         # driver-green r05
    dedup,         # driver-green r05
    streaming,     # driver-green r05
    pipeline,      # driver-green r05
    textstats,     # driver-green r05
    sinks,         # driver-green r05
)
