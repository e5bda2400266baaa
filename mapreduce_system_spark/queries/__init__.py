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
has a fresh driver-green row from CORRECTNESS_r06/r07.

Round-8 window (9 registry-core queries precede these, positions 1-9),
executing VERDICT.md r7 #1 (rotate every r05-era row) plus the r8
debuts:

- pipeline (8, r05 rows — the oldest evidence; its textstats helper
  dependency moved to ``_textshared`` so this import no longer drags
  textstats' registrations) → 10-17;
- streaming (8, r05 rows) → 18-25;
- fresh (4, r05 rows: asof_salted, sim_recall, range frames,
  sessionize) → 26-29;
- textstats2 (2, r05 rows: udtf_sentence_stats + txt_heavy_hitters,
  split out of textstats for exactly this rotation — textstats' other
  7 are r07-green and stay out) → 30-31;
- fresh7b (3, ALL CHANGED r8: BM25's broadcast build side
  pre-filtered, surprisal's vocab broadcast hint dropped, int8's
  dimension count derived; its two r07-green unchanged riders moved to
  ``fresh7b2``, out of window, so the slots track changed code) →
  32-34;
- fresh7d (1; graph_pagerank — operator gained dangling/tol paths
  this round, so its fixed-iteration row re-pins) → 35;
- fresh8a (2 NEW r8: graph_pagerank_dangling, sink_merge_upsert) →
  36-37;
- fresh8b (4 NEW r8: KL divergence, char entropy, bigram conditional
  entropy, Zipf slope) → 38-41;
- fresh8c (3 NEW r8: stratified sample, source-mix weights,
  containment dedup) → 42-44;
- fresh8d (4 NEW r8: equi-width histogram, cume/ntile window family,
  nearest as-of join, HOF vector stats) → 45-48;
- fresh8e (2 NEW r8: per-label centroid outliers, correlated scalar
  subquery Q17) → 49-50.

Out of window this round: fresh8f, fresh8g, fresh8h, fresh8i,
fresh8j, fresh8k, fresh8l, and fresh8m (NEW r8,
landed after the window filled — rotate FIRST in r9 so each gets its
debut driver row), fresh7b2 (the two unchanged r07-green queries split
out of fresh7b),
then the driver-green r06/r07 modules: fresh7, fresh7c, fresh7e,
fresh7f, fresh6, sinks, relational2, dedup, textstats (7), temporal,
advanced, multimodal, similarity, relational. Oldest rows after the
r8 sweep are r06 — r9's window should take fresh8f + fresh8g +
fresh8h + fresh8i + fresh8j + fresh8k + fresh8l + fresh8m, then
temporal, advanced, multimodal, similarity, relational.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    pipeline,      # r05 rows — rotated first (VERDICT r7 #1)
    streaming,     # r05 rows
    fresh,         # r05 rows
    textstats2,    # r05 rows (the two textstats stragglers, split out)
    fresh7b,       # 3 queries changed r8 (broadcast fixes) + 2 riders
    fresh7d,       # operator changed r8 (dangling/tol) — re-pin
    fresh8a,       # NEW r8: dangling-corrected PageRank, MERGE upsert sink
    fresh8b,       # NEW r8: corpus statistics (KL, entropy, Zipf)
    fresh8c,       # NEW r8: stratified sample, mix weights, containment
    fresh8d,       # NEW r8: histogram, cume/ntile, nearest as-of, HOF stats
    fresh8e,       # NEW r8: centroid outliers, correlated scalar subquery
    fresh8f,       # NEW r8, past the 50-query window — r9 debuts
    fresh8g,       # NEW r8, past the 50-query window — r9 debuts
    fresh8h,       # NEW r8, past the 50-query window — r9 debuts
    fresh8i,       # NEW r8, past the 50-query window — r9 debuts
    fresh8j,       # NEW r8, past the 50-query window — r9 debuts
    fresh8k,       # NEW r8, past the 50-query window — r9 debuts
    fresh8l,       # NEW r8, past the 50-query window — r9 debuts
    fresh8m,       # NEW r8, past the 50-query window — r9 debuts
    fresh7b2,      # r07-green riders split out of fresh7b (unchanged code)
    fresh7,        # driver-green r07
    fresh7c,       # driver-green r07
    fresh7e,       # driver-green r07
    fresh7f,       # driver-green r07
    fresh6,        # driver-green r07
    sinks,         # driver-green r07
    relational2,   # driver-green r07
    dedup,         # driver-green r07
    textstats,     # driver-green r07 (remaining 7)
    temporal,      # driver-green r06 — rotate in r9
    advanced,      # driver-green r06 — rotate in r9
    multimodal,    # driver-green r06 — rotate in r9
    similarity,    # driver-green r06 — rotate in r9
    relational,    # driver-green r06 — rotate in r9
)
