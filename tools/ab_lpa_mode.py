"""A/B: LPA per-round argmax — two-phase count+max(struct) (status quo,
two exchanges per round) vs a single mode(lbl, deterministic=True)
aggregate (one exchange per round; Spark 4's deterministic mode returns
the LOWEST value among equally-frequent ones — exactly LPA's
most-frequent-then-smallest tie-break).

Labels are identical by definition of the tie-break, asserted
bit-for-bit per run on the full node-sized output.

Protocol: one untimed warm-up, then ALTERNATING A/B runs (3 each);
medians decide; the record commits either way.

Usage: python tools/ab_lpa_mode.py [sf_dir] [reps]
Writes bench_runs/r17_lpa_mode_ab.json.
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
from mapreduce_system_spark.operators.graph import label_propagation  # noqa: E402
from mapreduce_system_spark.queries._graphshared import copurchase_pairs  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import assert_sane_walls  # noqa: E402

_ITER = 3  # the registered graph_label_propagation constant (fresh10)


def communities(spark, sf_dir: str, argmax_mode: bool):
    """The registered graph_label_propagation shape with the knob."""
    pr = copurchase_pairs(spark, sf_dir)
    out = label_propagation(
        pr, src="u", dst="v", iterations=_ITER,
        edges_undirected_distinct=True, argmax_mode=argmax_mode,
    )
    return out.select(
        F.col("node").alias("part"), F.col("label").alias("community")
    ).orderBy("part")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_lpa_mode")

    def run(argmax_mode: bool):
        t0 = time.time()
        rows = [tuple(r) for r in communities(spark, sf_dir, argmax_mode).collect()]
        wall = time.time() - t0
        caches.release()
        return wall, rows

    run(False)  # untimed warm-up (JVM/codegen; arm-neutral: shared plans)
    walls: dict[str, list[float]] = {"two_phase": [], "mode": []}
    ref_rows = None
    for _ in range(reps):
        for label, argmax_mode in (("two_phase", False), ("mode", True)):
            w, rows = run(argmax_mode)
            walls[label].append(round(w, 2))
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{label} diverged from first result"
    med_a = statistics.median(walls["two_phase"])
    med_b = statistics.median(walls["mode"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "alternating A/B, median-of-%d per arm, untimed warm-up first, "
            "bit-identical labels asserted per run" % reps
        ),
        "sf_dir": sf_dir,
        "constants": {"iterations": _ITER},
        "walls": walls,
        "median_two_phase_s": med_a,
        "median_mode_s": med_b,
        "mode_over_two_phase": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
        "n_nodes": len(ref_rows or []),
    }
    out = REPO / "bench_runs" / "r17_lpa_mode_ab.json"
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median two_phase={med_a}s mode={med_b}s "
        f"ratio={record['mode_over_two_phase']}"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
