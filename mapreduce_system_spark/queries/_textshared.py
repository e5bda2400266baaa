"""Shared text-oracle fragments and scan helper — NO query registrations.

Split out of ``queries/textstats.py`` so that modules needing the token
algebra (``pipeline``, ``textstats2``) can import it WITHOUT triggering
textstats' registrations: registration order is the driver's correctness
window (see ``queries/__init__``), and a helper import must never drag a
module's nine queries into (or ahead of) the window as a side effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.sources.tables import ensure_parallelism, load_table


def _docs(spark: SparkSession, sf_dir: str, columns: list[str]) -> DataFrame:
    """Documents scan spread across cores — the token-algebra expressions
    are CPU-bound."""
    return ensure_parallelism(load_table(spark, sf_dir, "documents", columns=columns))


# DuckDB fragments mirroring functions.text primitives.
_TOKS = r"list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"
_STOPLIST = "['" + "', '".join(TXT.STOPWORDS) + "']"


def _marker_score_sql(lang: str) -> str:
    markers = "['" + "', '".join(TXT.LANG_MARKERS[lang]) + "']"
    return f"len(list_filter(ts, t -> list_contains({markers}, t)))"
