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
has a driver-green row from CORRECTNESS_r05/r06.

Round-7 window (9 registry-core queries precede these, positions 1-9),
executing VERDICT.md r6 #1/#2 plus the new r7 exhibits:

- fresh7 (1 NEW r7 query: rel_bloom_join_pruned — runtime Bloom-filter
  join pruning, the row-group sibling of the DPP exhibit) → 10;
- fresh7b (5 NEW r7 queries: gap-fill resample, BM25 top-k, md5 hash
  split, unigram surprisal, int8 quantization error) → 11-15;
- fresh7c (2 NEW r7 queries: CDC latest-state compaction, SCD2
  validity intervals) → 16-17;
- fresh7d (1 NEW r7 query: graph_pagerank — 3-iteration PageRank vs an
  unrolled-CTE oracle) → 18;
- fresh7e (1 NEW r7 query: rel_funnel_conversion — ordered-event
  funnel) → 19;
- fresh7f (3 NEW r7 queries: pipe_weighted_sample — deterministic A-ES
  weighted top-k sampling — txt_shingle_novelty, and
  agg_moments_profile) → 20-22;
- fresh6 (2; the totals harness was reworked this round to the
  sink-based last-state pattern — needs a fresh driver row) → 23-24;
- sinks (5; sink_dpp_join_pruned registered AFTER the r6 sweep and has
  never had a driver row — the r6 verdict's #1 debt; the other four
  refresh their r05 rows) → 25-29;
- relational2 (6; agg_distinct_stats, agg_approx_distinct,
  agg_star_pricing, rel_full_outer_join, rel_pivot_priority_revenue,
  rel_unpivot_metrics — the r04-era rows, oldest evidence in the
  catalog, split out of relational.py for exactly this rotation) →
  30-35;
- dedup (8, r05 rows) → 36-43;
- textstats (first 7 of 9, r05 rows; registers ahead of pipeline
  because pipeline.py imports it at module top) → 44-50.

Out of window this round: textstats' last 2 (udtf_sentence_stats,
txt_heavy_hitters), pipeline (8), streaming (8) and fresh (4) — all
r05; rotate these FIRST in r8 — then temporal, advanced, multimodal,
similarity, relational (all driver-green r06).
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh8a,       # NEW r8: dangling-corrected PageRank
    fresh8b,       # NEW r8: corpus statistics (KL, entropy, Zipf)
    fresh8c,       # NEW r8: stratified sample, mix weights, containment
    fresh8d,       # NEW r8: histogram, cume/ntile, nearest as-of, HOF stats
    fresh7,        # NEW r7: rel_bloom_join_pruned (runtime Bloom-filter join)
    fresh7b,       # NEW r7: 5 pipeline/retrieval/quantization queries
    fresh7c,       # NEW r7: CDC compaction + SCD2 intervals
    fresh7d,       # NEW r7: PageRank vs unrolled-CTE oracle
    fresh7e,       # NEW r7: ordered-event funnel conversion
    fresh7f,       # NEW r7: A-ES sampling, novelty, moment aggregates
    fresh6,        # totals harness reworked r7 — re-pin both stateful queries
    sinks,         # sink_dpp_join_pruned's first-ever driver row (r6 debt #1)
    relational2,   # the six r04-era rows (r6 debt #2)
    dedup,         # r05 rows
    pipeline,      # r05 rows (transitively registers textstats first;
                   # first 2 queries in window, last 6 rotate in r8)
    streaming,     # r05 rows — out of window, rotate FIRST in r8
    fresh,         # r05 rows — out of window, rotate in r8
    textstats,     # already registered via pipeline's import; kept for clarity
    temporal,      # driver-green r06
    advanced,      # driver-green r06
    multimodal,    # driver-green r06
    similarity,    # driver-green r06
    relational,    # driver-green r06 (all 12 remaining)
)
