"""Round-6 addition: the stateful streaming operator, driver-checked.

``streaming.stateful.user_running_totals`` (applyInPandasWithState —
the engine-side analog of the reference's reduce contract for streams,
worker.go:161-165) was the one streaming capability with pytest-only
evidence. This registers it with a REAL stream in the callable: the
events fixture is staged into three parquet files, streamed back with
``maxFilesPerTrigger=1`` (three micro-batches, so per-key state provably
carries across batch boundaries), and the final state per user is the
query result. The oracle is the plain batch GROUP BY — if state were
lost or double-counted between micro-batches, the totals could not
match it.

Registered FIRST among the domain modules so the query lands inside the
driver's 50-query correctness window on its debut (see
queries/__init__.py).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# Same oracle as stream_user_totals_batch (queries/streaming.py): the
# stream's final state must equal the batch aggregate.
_STATEFUL_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("stream_stateful_user_totals", _STATEFUL_TOTALS_SQL)
def q_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run ``user_running_totals`` through an actual file-source stream
    (availableNow trigger, one file per micro-batch) and return the final
    per-user (count, sum) state.

    ``foreachBatch`` keeps only the LAST update per user — batches are
    delivered to foreachBatch strictly in order, so overwriting yields
    the final state; its size is O(distinct users), the same bound the
    operator's keyed state already carries. Scratch staging + checkpoint
    dirs are per-(app, run) and removed afterwards."""
    from mapreduce_system_spark.streaming import stateful as ST

    app = spark.sparkContext.applicationId
    base = Path(f"/tmp/spark_graft_stateful_{Path(sf_dir).name}_{app}_{uuid.uuid4().hex[:8]}")
    src, ck = str(base / "src"), str(base / "ck")
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "value"])
    ev.repartition(3).write.mode("overwrite").parquet(src)

    final: dict[int, tuple[int, float]] = {}
    batches: list[int] = []

    def take_latest(batch_df, batch_id: int) -> None:
        batches.append(batch_id)
        # O(users) rows per batch — the stateful op already emits one row
        # per updated key, so this collect is bounded by the key space.
        for r in batch_df.collect():
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ST.user_running_totals(stream)
        .writeStream.foreachBatch(take_latest)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        try:
            q.stop()
        except Exception:
            pass
        shutil.rmtree(base, ignore_errors=True)

    if len(batches) < 2:
        # the whole point is state ACROSS micro-batches; a single batch
        # would silently weaken the check into a per-batch aggregation
        raise RuntimeError(f"expected >=2 micro-batches, saw {batches}")

    rows = [(u, n, t) for u, (n, t) in sorted(final.items())]
    out = spark.createDataFrame(rows, "user_id long, n_events long, total_value double")
    # round in Spark (HALF_UP, matching the oracle), not in Python
    # (round() is banker's rounding)
    return out.select(
        "user_id", "n_events", F.round("total_value", 2).alias("total_value")
    ).orderBy("user_id")
