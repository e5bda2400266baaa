"""Operator library — the engine's capability surface.

- ``mapreduce``  — the reference's own workloads (word count README.MD:25-53,
  grep/sort/inverted-index/frequency from the OSDI'04 paper it implements)
  plus a generic ``map_reduce`` API honoring the reference's
  ``(mapf, reducef)`` contract (``worker.go:51``).
- ``relational`` — joins / aggregations / windows / set ops / grouping sets
  over the TPC-H-ish star schema (MapReduce-expressible per the paper §2;
  absent as code in the reference — SURVEY.md §2b).
- ``dedup``      — exact + MinHash-LSH + SimHash + n-gram-Jaccard
  near-dup (north-star LLM-pipeline extension).
- ``similarity`` — brute-force, IVF, and LSH-bucketed top-k embedding
  search + blocked embedding-cosine near-dup pairs.
"""
