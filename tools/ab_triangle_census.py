"""A/B: settle graph_triangle_count vs the r17 degree_census explode
(VERDICT r17 #1 — the round's one open perf question).

graph_triangle_count was +26-40% load-corrected in all three post-change
r17 runs, and the A/B that justified the change it consumes
(bench_runs/r17_degree_census_ab.json) is INVALID by the spread rule
(union [17.29, 15.93, 8.73] / explode [21.07, 8.24, 7.33] — monotone
co-tenant decay, overlapping arms). This harness re-runs the decision
driving graph_triangle_count ALONE, alternating arms in one session,
with the spread rule ENFORCED (tools/_abcommon.py): a record is only
written when every arm's series is sane; otherwise retry, then refuse.

Arms patch the shared ``operators.graph.degree_census`` exactly like
ab_degree_census.py did:
- union   — the pre-r17 unionAll-of-two-projections census;
- explode — the r17 one-pass explode(array(u, v)) census (HEAD).

Timing uses the bench's noop sink (guide §1.4), not collect, so the
timed action is the query's own shape. Outputs are asserted
bit-identical per run via a separate (untimed) collect.

Usage: python tools/ab_triangle_census.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_triangle_census_ab.json (exit 3 if no sane record
could be produced).
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
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "graph_triangle_count"


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
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_triangle_census")
    new_form = G.degree_census

    def run(form, *, timed: bool = True):
        G.degree_census = form
        try:
            df = QUERIES[_QUERY](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]  # caches warm: untimed check
        finally:
            G.degree_census = new_form
            caches.release()
        return wall, out

    arms = (("union", _union_degree_census), ("explode", new_form))
    record = None
    for attempt in range(attempts):
        run(_union_degree_census)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"union": [], "explode": []}
        ref = None
        for _ in range(reps):
            for label, form in arms:
                w, out = run(form)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["union"])
        med_b = statistics.median(walls["explode"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, noop-sink timing, bit-identical outputs asserted "
                "per run, spread rule enforced (tools/_abcommon.py); "
                "wall = graph_triangle_count alone" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_union_s": med_a,
            "median_explode_s": med_b,
            "explode_over_union": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_triangle_census_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median union={record['median_union_s']}s "
        f"explode={record['median_explode_s']}s "
        f"ratio={record['explode_over_union']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
