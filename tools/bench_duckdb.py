"""Head-to-head single-node throughput: DuckDB oracle SQL vs our Spark queries.

Runs every `oracle_sql()` entry in DuckDB over the same sf parquet tables that
`bench.py` feeds Spark, times each, and prints one JSON line. Used to produce
the comparison table in BASELINE.md §(c). DuckDB is the strongest practical
single-node stand-in: the actual reference (a teaching MapReduce runtime with a
1 s sleep per task RPC, worker.go:186) is not a meaningful timing opponent.
"""
import json
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from mapreduce_system_spark.registry import SF_BOUND_ORACLES
    from mapreduce_system_spark.sources.tables import TABLES

    oracles = dict(entry.oracle_sql())
    skipped = []
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.01":
        # sf-bound oracles read Spark-exported side tables under STATIC
        # sf0.01 paths (the driver's gate scale). At any other sf their
        # SQL would join this run's views against the wrong-scale export
        # (if one is lying around from a verify run) — a meaningless
        # cross-sf result silently summed into the headline, or a
        # spurious failure if absent. Skip them, visibly, like
        # tools/verify_local.py does.
        skipped = sorted(SF_BOUND_ORACLES & set(oracles))
        for name in skipped:
            del oracles[name]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    budget = float(os.environ.get("DUCKDB_QUERY_TIMEOUT", "60"))
    timings, failures = {}, {}
    for name, sql in oracles.items():
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # pragma: no cover - diagnostic path
            wall = time.perf_counter() - t0
            msg = str(exc).split("\n")[0]
            if wall >= budget:
                msg = f"TIMEOUT >{budget}s ({msg})"
            failures[name] = msg
        finally:
            timer.cancel()
    out = {
        "metric": "duckdb_oracle_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "failures": failures,
        "skipped_sf_bound": skipped,
        "sf": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
