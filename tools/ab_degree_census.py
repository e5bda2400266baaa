"""A/B: degree_census — unionAll of two endpoint projections (status
quo: plans the edge subtree twice per census) vs ONE explode(array(u,v))
pass. Drives the two REGISTERED queries that census an uncached edge
construction (graph_degree_distribution, graph_triangle_count) by
patching the shared helper per arm — same alternating-arm protocol as
the other r17 A/Bs, outputs asserted bit-identical per run.

Usage: python tools/ab_degree_census.py [sf_dir] [reps]
Writes bench_runs/r17_degree_census_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.operators import graph as G  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import assert_sane_walls  # noqa: E402

_QUERIES = ("graph_degree_distribution", "graph_triangle_count")


def _union_degree_census(pr: DataFrame) -> DataFrame:
    """The pre-r17 spelling, kept here verbatim as the A arm."""
    return (
        pr.select(F.col("u").alias("node"))
        .unionAll(pr.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_degree_census")
    new_form = G.degree_census

    def run(form):
        G.degree_census = form
        out = {}
        try:
            t0 = time.time()
            for name in _QUERIES:
                out[name] = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
                caches.release()
            wall = time.time() - t0
        finally:
            G.degree_census = new_form
        return wall, out

    run(_union_degree_census)  # untimed warm-up, arm-neutral
    walls: dict[str, list[float]] = {"union": [], "explode": []}
    ref = None
    for _ in range(reps):
        for label, form in (("union", _union_degree_census), ("explode", new_form)):
            w, out = run(form)
            walls[label].append(round(w, 2))
            if ref is None:
                ref = out
            assert out == ref, f"{label} diverged from first result"
    med_a = statistics.median(walls["union"])
    med_b = statistics.median(walls["explode"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "alternating A/B, median-of-%d per arm, untimed warm-up first, "
            "bit-identical outputs asserted per run; wall = both queries "
            "back-to-back in one session" % reps
        ),
        "sf_dir": sf_dir,
        "queries": list(_QUERIES),
        "walls": walls,
        "median_union_s": med_a,
        "median_explode_s": med_b,
        "explode_over_union": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
    }
    out_p = REPO / "bench_runs" / "r17_degree_census_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(f"median union={med_a}s explode={med_b}s ratio={record['explode_over_union']}")
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
