"""A/B: k-truss orientation reuse (VERDICT r16 #4) — re-derive the
compact-forward (degree, id) order per support call (status quo) vs
pin the round-0 order once and reuse it for every call.

The shavable cost named by the verdict: at the registered constants
(k=8, rounds=2) ``k_truss_edges`` runs THREE support calls (two peel
rounds + the final census), and each re-derives ``degree_census`` (a
2E-row shuffle) and re-plans ``orient_by_degree`` against it, when any
fixed total vertex order counts each triangle exactly once. The reuse
path checkpoints the round-0 degree table and orients every call
against it; outputs are bit-identical (pinned by
tests/test_ktruss.py::test_ktruss_orientation_reuse_is_bit_identical
and re-asserted per run here).

Protocol (the pagerank rejected-levers discipline,
bench_runs/r14_pagerank_isolated.json): one untimed warm-up, then
ALTERNATING A/B runs (3 each) so JVM/codegen warmth cannot favor one
arm; medians decide; the record commits either way.

Usage: python tools/ab_ktruss_orientation.py [sf_dir] [reps]
Writes bench_runs/r17_ktruss_ab.json.
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


def census(spark, sf_dir: str, reuse: bool):
    """The registered graph_k_truss shape with the orientation knob."""
    pr = copurchase_pairs(spark, sf_dir)
    out = k_truss_edges(
        pr, _KTRUSS_K, src="u", dst="v", rounds=_KTRUSS_ROUNDS,
        edges_undirected_distinct=True, reuse_orientation=reuse,
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
    spark = get_spark("ab_ktruss_orientation")

    def run(reuse: bool):
        t0 = time.time()
        rows = [tuple(r) for r in census(spark, sf_dir, reuse).collect()]
        wall = time.time() - t0
        caches.release()
        return wall, rows

    run(False)  # untimed warm-up (JVM/codegen; arm-neutral: shared plans)
    walls: dict[str, list[float]] = {"rederive": [], "reuse": []}
    ref_rows = None
    for _ in range(reps):
        for label, reuse in (("rederive", False), ("reuse", True)):
            w, rows = run(reuse)
            walls[label].append(round(w, 2))
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{label} diverged from first result"
    med_a = statistics.median(walls["rederive"])
    med_b = statistics.median(walls["reuse"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "VERDICT r16 #4 — alternating A/B, median-of-%d per arm, "
            "untimed warm-up first, bit-identical census asserted per run"
            % reps
        ),
        "sf_dir": sf_dir,
        "constants": {"k": _KTRUSS_K, "rounds": _KTRUSS_ROUNDS},
        "walls": walls,
        "median_rederive_s": med_a,
        "median_reuse_s": med_b,
        "reuse_over_rederive": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
        "n_census_rows": len(ref_rows or []),
    }
    out = REPO / "bench_runs" / "r17_ktruss_ab.json"
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median rederive={med_a}s reuse={med_b}s "
        f"ratio={record['reuse_over_rederive']}"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
