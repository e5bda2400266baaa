"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the reference's worked
word-count example, README.MD:25-53) at sf0.001. ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL. Column
names/types are aligned pairwise; doubles are rounded on both sides;
temporal outputs are formatted to strings so value hashes compare exactly.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from mapreduce_system_spark.registry import QUERIES, ORACLE_SQL  # noqa: E402
from mapreduce_system_spark.operators.mapreduce import word_count  # noqa: E402
from mapreduce_system_spark.sources.tables import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents", columns=["text"])
    return word_count(docs, "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLE_SQL)
