"""BM25 query-set constants shared by fresh7b (txt_bm25_topk) and
fresh11 (txt_rrf_fusion, which fuses that registered ranking).

A separate NON-REGISTERING module on purpose: registration order is
load-bearing (queries/__init__.py), so a query module must never
import another query module at top level — the imported module's
@register calls would fire at the importer's position and silently
re-seat its queries in the driver window (found when fresh11's draft
import of fresh7b did exactly that). Constants live here; the BM25
CALLABLE is resolved through registry.QUERIES at call time.
"""

from __future__ import annotations

# (query, term) pairs; terms drawn from the fixture vocabulary, including
# one rare term ("dup" — planted by the near-dup fixtures) so the idf
# spread is exercised, not just uniform-frequency terms.
BM25_QUERIES: list[tuple[str, str]] = [
    ("fast table scan", "fast"),
    ("fast table scan", "table"),
    ("fast table scan", "scan"),
    ("hash join merge", "hash"),
    ("hash join merge", "join"),
    ("hash join merge", "merge"),
    ("dup stream", "dup"),
    ("dup stream", "stream"),
]

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

BM25_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)
