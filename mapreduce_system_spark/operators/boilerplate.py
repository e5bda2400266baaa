"""Boilerplate-line stripping — per-source line-frequency filtering.

The CCNet/RefinedWeb-style cleanup a web-scale curation pipeline runs
before dedup: lines that repeat across a large fraction of a SOURCE's
documents (navigation, cookie banners, footers) are template structure,
not content — strip them while preserving every remaining line in
order. Staged r13 for the r14 debut ``pipe_strip_boilerplate``.

Spark-first shape, audited for 100 TB:

- one ``posexplode`` pass over the corpus produces the positional line
  relation; the frequency analysis is one distinct + one aggregation
  on (source, line) — map-side combinable, skew-bounded because a
  line's count is capped by its source's document count;
- the boilerplate set (lines above the ratio) is a per-source
  TEMPLATE-sized relation — it grows with the template vocabulary, not
  the corpus — joined back as a LEFT ANTI equi-join on
  (source, trimmed line): the only corpus-sized shuffles are the
  explode's aggregation and the anti-join, both on bounded keys;
- reassembly is the sorted-``collect_list`` fidelity pattern
  (``mr_per_key_fold``): per-doc line lists are document-sized, never
  corpus-sized.

Determinism for the SQL oracle: classification keys are ``trim(line)``;
whitespace-only lines are structure, never classified (kept verbatim);
NULL text is treated as '' (one empty line) symmetrically on both
engines.

Reference contrast: worker.go:104-165's one-shot map→reduce can count
line frequencies (word count on lines) but cannot join the frequency
relation back against the positional lines and reassemble the
documents — the strip needs two relations met on the line key plus an
order-preserving regroup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_system_spark.caches import tracked_cache


def strip_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_doc_ratio: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove lines appearing in ≥ ``min_doc_ratio`` of a source's docs
    (and ≥ ``min_docs`` docs absolutely — a 1-doc source must not strip
    itself). Returns one row per input doc:
    (id, source, clean_text, n_lines, n_removed) with ``clean_text``
    the surviving lines rejoined by ``\\n`` in original order (''
    when everything was stripped), ``n_lines`` the original line count.

    A line's classification key is its TRIMMED text within its source;
    whitespace-only lines are never boilerplate (kept verbatim — they
    are document structure). NULL ids/sources pass through as groups;
    NULL text behaves as ''. Duplicate lines within one doc count once
    toward the doc-frequency (incidence, not multiplicity) but are each
    kept/stripped by the shared verdict.
    """
    if not 0.0 < min_doc_ratio <= 1.0:
        raise ValueError(f"min_doc_ratio must be in (0, 1], got {min_doc_ratio}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    # positional line relation — cached: the frequency branch and the
    # anti-join both read it, and the split is the corpus's CPU hot spot
    lines = tracked_cache(
        base.select(
            "id",
            "source",
            F.posexplode(F.split(F.col("t"), "\n")).alias("pos", "line"),
        ).withColumn("key", F.trim("line"))
    )
    n_docs = base.groupBy("source").agg(F.count("*").alias("nd"))
    bp = (
        lines.where(F.col("key") != "")
        .select("source", "key", "id")
        .distinct()
        .groupBy("source", "key")
        .agg(F.count("*").alias("c"))
        .join(n_docs, "source")
        .where(
            (F.col("c") >= min_docs)
            & (F.col("c").cast("double") >= F.lit(min_doc_ratio) * F.col("nd"))
        )
        .select("source", "key")
    )
    kept = lines.join(bp, ["source", "key"], "left_anti")
    # sorted-collect_list reassembly (document-sized lists); left join
    # back to the doc spine so fully-stripped docs survive with ''
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (
        base.select("id", "source")
        .join(totals, "id")
        .join(agg, "id", "left")
        .select(
            "id",
            "source",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
