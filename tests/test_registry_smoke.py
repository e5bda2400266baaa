"""Every registered query must *execute* end-to-end at sf0.001.

Guards against the round-2 failure mode: an operator's unit test passes
(it exercises the operator with its own arguments) while the *registered*
query errors (it wires the operator differently — e.g. referencing a
column the operator dropped). Running each ``queries()`` entry through a
no-collect action catches any AnalysisException / schema mismatch at the
cheapest scale before the driver's correctness sweep does.

Streaming-parity queries are batch twins here, so they run too. The test
is parametrized per query so a failure names the broken entry directly.
"""

from __future__ import annotations

import pytest

from mapreduce_system_spark import caches
from mapreduce_system_spark.registry import QUERIES
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_query_executes(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    try:
        # noop write executes the full physical plan without materializing
        # rows on the driver — same action the bench harness uses.
        df.write.format("noop").mode("overwrite").save()
    finally:
        caches.release()


def test_every_oracle_has_a_query():
    from mapreduce_system_spark.registry import ORACLE_SQL

    dangling = set(ORACLE_SQL) - set(QUERIES)
    assert not dangling, f"oracle entries without a registered query: {dangling}"
