"""Bench harness: time every registered query at the bench scale factor.

Runs each ``__spark_entry__.queries()`` entry on
``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and prints ONE JSON line::

    {"metric": "total_query_wall", "value": <sum sec>, "unit": "sec",
     "queries": {"mr_word_count": 1.23, ...}, "sf": 0.1}

Each query's plan is fully executed through the ``noop`` sink (whole plan
runs, nothing is collected to the driver — the same shape a cluster write
would have). A JVM warm-up query runs first so per-query numbers measure
the engine, not session startup. Per BASELINE.md §(c) the first recorded
run seeds the regression bar; later rounds must stay within 2×.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402


def run_to_completion(df) -> int:
    """Execute the full physical plan without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    unknown = only - set(entry_mod.queries())
    if unknown:
        # a typo would otherwise time nothing and report value=0/failures=0,
        # which a regression gate reads as a huge speedup
        print(f"# unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    spark = get_spark("bench")
    # Warm up the JVM / codegen / parquet footer caches outside the clock.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and the Python worker pool + Arrow serialization path, so the
    # first pandas-UDF query in registration order doesn't absorb the
    # daemon cold-start (~1-2 s) into its own number. SCALAR and
    # GROUPED_AGG take different physical paths (ArrowEvalPython vs
    # AggregateInPandas) — warm both, or the first GROUPED_AGG query
    # (agg_weighted_mean_udaf) shows a recurring false regression.
    from pyspark.sql import functions as F

    spark.range(1000).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))
    ).write.format("noop").mode("overwrite").save()
    from mapreduce_system_spark.functions.udafs import weighted_mean

    spark.range(1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("double").alias("v")
    ).groupBy("g").agg(weighted_mean()("v", "v")).write.format("noop").mode(
        "overwrite"
    ).save()

    # mapInPandas runs one Python worker PER PARTITION concurrently; the
    # earlier warmups only spawn a handful, so the first wide mapInPandas
    # query in run order used to absorb the remaining ~24-28 worker
    # spawns (pandas+pyarrow+package import each) — measured ~5-7 s on
    # this box, the whole of the r8 mm_blob_features "regression". Warm
    # the full-width pool with the package import on board, and re-warm
    # at the top of every sweep: if the pool was idle-reaped mid-run the
    # respawn cost lands here (outside the per-query clocks), not on
    # whichever multimodal query runs first.
    from mapreduce_system_spark import pyfiles

    pyfiles.ensure_package_on_executors(spark)

    def _warm_python_pool() -> None:
        def _touch(batches):
            import mapreduce_system_spark.operators.multimodal  # noqa: F401

            for b in batches:
                yield b

        n_part = spark.sparkContext.defaultParallelism
        spark.range(32 * n_part, numPartitions=n_part).mapInPandas(
            _touch, "id long"
        ).write.format("noop").mode("overwrite").save()

    _warm_python_pool()

    # SPARK_GRAFT_BENCH_RUNS > 1 repeats the sweep and reports the
    # per-query MEDIAN (BASELINE_HISTORY.md §(e)/(g): single runs sit inside a
    # ±30% co-tenant noise band on this box, which otherwise dominates
    # round-over-round deltas). The driver's per-round invocation keeps
    # the default of 1 so its wall-clock budget is unchanged; round
    # records committed to bench_runs/ are median-of-3 runs.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")))
    # Ambient marker (VERDICT r14 #4): the r14 sweep band was wide enough
    # (222.7-372.4 s over identical code) to hide a real ~1.5x single-query
    # regression, and the one contaminated sweep (r14a, concurrent pytest)
    # was only diagnosable after the fact. Sample the box 1/5/15-min load
    # averages at sweep start and end so every committed record carries
    # its own contamination evidence; bench_compare annotates from these.
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    run_timings: list[dict[str, float]] = []
    for run_i in range(n_runs):
        if run_i:  # re-warm the Python pool outside the clocks (see above)
            _warm_python_pool()
        timings: dict[str, float] = {}
        for name, fn in entry_mod.queries().items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                run_to_completion(fn(spark, sf_dir))
                timings[name] = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001
                timings[name] = -1.0
                print(f"# bench error {name} (run {run_i}): {e}", file=sys.stderr)
            finally:
                caches.release()  # operator-level caches must not span queries
        run_timings.append(timings)

    import statistics

    median: dict[str, float] = {}
    failures = 0
    for name in run_timings[0]:
        ok = [t[name] for t in run_timings if t[name] >= 0]
        if ok:
            median[name] = round(statistics.median(ok), 3)
        else:
            median[name] = -1.0
            failures += 1

    # failures is explicit so regression gating can tell "faster" from
    # "fewer queries ran" (a -1 entry is excluded from the total).
    result = {
        "metric": "total_query_wall",
        "value": round(sum(t for t in median.values() if t >= 0), 3),
        "unit": "sec",
        "queries": median,
        "failures": failures,
        "sf": sf,
        "median_of": n_runs,
        # 1/5/15-min load averages; a 1-min start value far above the
        # sweep's own parallelism (32) means a co-tenant was running and
        # the record is a band point, not a floor reading
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "ncpu": os.cpu_count(),
    }
    if n_runs > 1:
        result["runs"] = run_timings
    # Persist the full record: the driver keeps only a bounded tail of
    # stdout, which truncates the per-query map once the catalog is large
    # (the first ~28 queries' numbers were lost from BENCH_r05.json that
    # way). Full catalog runs land in bench_runs/latest.json — copy to a
    # per-round file and commit for a durable history. Partial runs
    # (explicit query args) go to latest_partial.json so they can never
    # masquerade as a catalog run.
    out = Path(__file__).resolve().parent / "bench_runs"
    try:
        out.mkdir(exist_ok=True)
        name = "latest_partial.json" if only else "latest.json"
        (out / name).write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    except OSError as e:  # read-only checkout etc. — never fail the bench
        print(f"# bench_runs persist skipped: {e}", file=sys.stderr)
    # stdout gets the compact record (the driver keeps only a bounded
    # tail); the full per-run detail lives in bench_runs/.
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
