"""Failure re-execution + atomic commit, demonstrated — not just delegated.

The reference's most distinctive machinery is transparent task re-execution
(10 s deadline re-issue, coordinator.go:204-218) over an atomic-rename sink
(worker.go:154-170, coordinator.go:50-79). SURVEY.md §2a rows 11-12 map
both onto the Spark runtime (``spark.task.maxFailures`` retries + the v1
FileOutputCommitter's task-attempt dir → rename protocol). This test turns
that delegation into evidence: a task UDF raises on its FIRST attempt, and
the job must still produce byte-identical results — including through a
parquet sink, where the failed attempt's partial output must never surface.

Retries need ``maxFailures > 1``, which local mode only honors through the
``local[N, F]`` master string — the shared test session runs ``local[4]``
(fail-fast, the right default for tests) — so this runs in a one-shot
subprocess with its own ``local[4,2]`` session.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4,2]")  # maxFailures=2: one retry
    .appName("fault_tolerance_probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = (
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")
    .repartition(4)
)


def flaky(batches):
    # self-contained closure (no repo imports → no addPyFile dependency)
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected transient failure (first attempt)")
    for pdf in batches:
        out = pdf.copy()
        out["n_chars"] = out["text"].fillna("").str.len().astype("int64")
        yield out[["doc_id", "n_chars"]]


schema = "doc_id long, n_chars long"
want = sorted(
    (r.doc_id, r.n_chars)
    for r in docs.select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars")
    ).collect()
)
assert want, "fixture empty"

# 1) transparent re-execution: the collect sees only retried-success output
got = sorted((r.doc_id, r.n_chars) for r in docs.mapInPandas(flaky, schema).collect())
assert got == want, f"retry changed results: {got[:3]} vs {want[:3]}"

# 2) atomic sink: the first attempt of partition 0 dies mid-write too; the
# committer must surface ONLY committed task output (no partials, no dupes)
path = os.path.join(tempfile.mkdtemp(prefix="spark_graft_ft_"), "sink")
docs.mapInPandas(flaky, schema).write.mode("overwrite").parquet(path)
back = sorted(
    (r.doc_id, r.n_chars) for r in spark.read.parquet(path).collect()
)
assert back == want, "sink round trip diverged after injected failure"
stray = [
    f for f in os.listdir(path)
    if not f.startswith(("part-", "_SUCCESS", ".")) or f.endswith((".tmp", ".pending"))
]
assert not stray, f"non-committed files surfaced: {stray}"
assert os.path.exists(os.path.join(path, "_SUCCESS")), "job-level commit marker missing"

print("FT_OK", len(back))
spark.stop()
"""


def test_task_retry_and_atomic_commit_survive_injected_failure():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "FT_OK" in proc.stdout, proc.stdout
