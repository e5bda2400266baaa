"""Registered dedup queries over the documents corpus.

The exact-Jaccard query carries a full DuckDB oracle (the shingle algebra
is replicated in SQL). MinHash-LSH is exact-verified after candidate
generation, so at a fixed corpus + deterministic hash family it reproduces
the exact pair set whenever recall is 1 — it carries the SAME oracle and a
pytest guards the recall property at small SF. SimHash's hash family is
not expressible in DuckDB → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import dedup as DD
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_EXACT_DEDUP_SQL = r"""
SELECT md5(trim(regexp_replace(lower(text), '\W+', ' ', 'g'))) AS fp,
       min(doc_id) AS survivor_id,
       count(*) AS n_copies
FROM documents
GROUP BY fp
ORDER BY fp
"""


@register("dedup_exact", _EXACT_DEDUP_SQL)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint; min-id survivor per group."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return DD.exact_dedup(docs).orderBy("fp")


# DuckDB twin of functions.text.shingles (3-gram) + pairwise Jaccard over
# the shingle-share join. List slicing is 1-based inclusive: ts[i:i+2] is
# the 3 tokens starting at i, matching Spark's slice(toks, i+1, 3).
_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '') AS ts
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(ts[i:i+2], ' ') for i in range(1, len(ts) - 1)]) AS sg
  FROM toks
  WHERE len(ts) >= 3
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.sg, b.sg))::DOUBLE
           / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sg, b.sg)) > 0
)
SELECT id_a, id_b, round(j, 6) AS jaccard
FROM pairs
WHERE j >= 0.5
ORDER BY id_a, id_b
"""


@register("dedup_jaccard_pairs", _JACCARD_SQL)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via the
    shingle-share equi-join — never all-pairs."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = DD.jaccard_pairs(docs, n=3, threshold=0.5)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy(
        "id_a", "id_b"
    )


@register("dedup_minhash_lsh", _JACCARD_SQL)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (128 hashes, 64 bands × 2 rows) with exact verification.

    Carries the same oracle as the exact query: precision is exact by
    construction, and at r=2/b=64 the miss probability for a true pair at
    j=0.5 is (1-0.25)^64 ≈ 1e-8 — recall 1 on the fixed gate corpus
    (guarded by tests/test_dedup.py equality assertion).
    """
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = DD.minhash_lsh_pairs(docs, n=3, threshold=0.5, num_hashes=128, rows_per_band=2)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy(
        "id_a", "id_b"
    )


@register("dedup_simhash_pairs")  # hash family not in DuckDB → rows-only
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 on 64-bit tf-weighted simhash),
    banded 4×16-bit candidate join."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return DD.simhash_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")
