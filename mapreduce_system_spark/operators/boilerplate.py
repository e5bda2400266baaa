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

Determinism for the SQL oracle: classification keys are ``trim(line)``
— ASCII-SPACE trim on both engines, so space-only lines are structure
(never classified) while tab/NBSP-only lines are content; NULL text is
treated as '' (one empty line) symmetrically on both engines; NULL doc
ids are dropped and NULL sources are real groups carried by null-safe
joins (``IS NOT DISTINCT FROM`` in the oracle).

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

    A line's classification key is its SPACE-trimmed text within its
    source (``trim`` strips ASCII spaces only, identically on both
    engines — a tab- or NBSP-only line is therefore CONTENT with its
    own key, not structure); lines empty after the space-trim are never
    boilerplate (kept verbatim). NULL ids are DROPPED (a NULL key
    cannot anchor reassembly, and two NULL-id docs would merge — the
    dedup family's NULL-key convention, r13 review); a NULL SOURCE is
    its own group (null-safe joins carry it through frequency analysis
    and stripping). NULL text behaves as ''. Duplicate lines within one
    doc count once toward the doc-frequency (incidence, not
    multiplicity) but are each kept/stripped by the shared verdict.
    """
    if not 0.0 < min_doc_ratio <= 1.0:
        raise ValueError(f"min_doc_ratio must be in (0, 1], got {min_doc_ratio}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    base = docs.where(F.col(id_col).isNotNull()).select(
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
    freq = (
        lines.where(F.col("key") != "")
        .select("source", "key", "id")
        .distinct()
        .groupBy("source", "key")
        .agg(F.count("*").alias("c"))
    )
    # null-safe source joins (r13 review): a NULL source is a real group
    # — plain equality would silently exempt the whole NULL-source
    # cohort from stripping (NULL never equi-joins its own frequency row)
    bp = (
        freq.join(
            n_docs, freq["source"].eqNullSafe(n_docs["source"])
        )
        .where(
            (F.col("c") >= min_docs)
            & (F.col("c").cast("double") >= F.lit(min_doc_ratio) * F.col("nd"))
        )
        .select(freq["source"].alias("bp_source"), F.col("key").alias("bp_key"))
    )
    kept = lines.join(
        bp,
        lines["source"].eqNullSafe(bp["bp_source"])
        & (lines["key"] == bp["bp_key"]),
        "left_anti",
    )
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
    # n_lines map-side from the UN-exploded text (identical to counting
    # the exploded rows, incl. the ['']-for-'' case) — the r13 review
    # removed a corpus-sized groupBy + join here
    return (
        base.select(
            "id", "source", F.size(F.split(F.col("t"), "\n")).alias("n_lines")
        )
        .join(agg, "id", "left")
        .select(
            "id",
            "source",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
