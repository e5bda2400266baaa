"""A/B: k-truss member-edge census — unionAll of three triangle
projections (status quo, plans the wedge self-join + closing-edge probe
THREE times per support call) vs ONE explode(array(...)) pass over the
triangle stream (the connected_components explode trick).

Support counts are identical by construction (the same three member
structs per triangle), asserted bit-for-bit per run.

Protocol (the pagerank rejected-levers discipline): one untimed warm-up,
then ALTERNATING A/B runs (3 each) so JVM/codegen warmth cannot favor
one arm; medians decide; the record commits either way.

Usage: python tools/ab_ktruss_members.py [sf_dir] [reps]
Writes bench_runs/r17_ktruss_members_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.operators.graph import k_truss_edges  # noqa: E402
from mapreduce_system_spark.queries._graphshared import copurchase_pairs  # noqa: E402
from mapreduce_system_spark.queries.fresh14 import (  # noqa: E402
    _KTRUSS_K,
    _KTRUSS_ROUNDS,
)
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import assert_sane_walls  # noqa: E402


def census(spark, sf_dir: str, explode_members: bool):
    """The registered graph_k_truss shape with the members knob."""
    pr = copurchase_pairs(spark, sf_dir)
    out = k_truss_edges(
        pr, _KTRUSS_K, src="u", dst="v", rounds=_KTRUSS_ROUNDS,
        edges_undirected_distinct=True, explode_members=explode_members,
    )
    return (
        out.groupBy("support")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("u").alias("sum_u"),
            F.sum("v").alias("sum_v"),
        )
        .orderBy("support")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_ktruss_members")

    def run(explode_members: bool):
        t0 = time.time()
        rows = [tuple(r) for r in census(spark, sf_dir, explode_members).collect()]
        wall = time.time() - t0
        caches.release()
        return wall, rows

    run(False)  # untimed warm-up (JVM/codegen; arm-neutral: shared plans)
    walls: dict[str, list[float]] = {"union": [], "explode": []}
    ref_rows = None
    for _ in range(reps):
        for label, explode_members in (("union", False), ("explode", True)):
            w, rows = run(explode_members)
            walls[label].append(round(w, 2))
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{label} diverged from first result"
    med_a = statistics.median(walls["union"])
    med_b = statistics.median(walls["explode"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "alternating A/B, median-of-%d per arm, untimed warm-up first, "
            "bit-identical census asserted per run" % reps
        ),
        "sf_dir": sf_dir,
        "constants": {"k": _KTRUSS_K, "rounds": _KTRUSS_ROUNDS},
        "walls": walls,
        "median_union_s": med_a,
        "median_explode_s": med_b,
        "explode_over_union": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
        "n_census_rows": len(ref_rows or []),
    }
    out = REPO / "bench_runs" / "r17_ktruss_members_ab.json"
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median union={med_a}s explode={med_b}s "
        f"ratio={record['explode_over_union']}"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
