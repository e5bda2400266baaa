"""A/B: pointer-jumping CC — cache the per-round jump input ``m`` (one
neighbor-min computation per round) vs recompute it on both self-join
sides (status quo; the broadcast/build and stream sides never
canonicalize to one AQE stage, so the neighbor-min subtree runs twice).

Runs the REGISTERED graph_components_jump query shape by patching the
operator reference inside queries.fresh15 with the knob — the chain
construction, rounds=4 constant, and census are exactly the driver's.
Census rows asserted bit-identical per run.

Protocol: one untimed warm-up, then ALTERNATING A/B runs (3 each);
medians decide; the record commits either way.

Usage: python tools/ab_ccjump_cachem.py [sf_dir] [reps]
Writes bench_runs/r17_ccjump_cachem_ab.json.
"""

from __future__ import annotations

import functools
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.operators import graph as G  # noqa: E402
from mapreduce_system_spark.queries import fresh15  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import assert_sane_walls  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_ccjump_cachem")
    orig = G.connected_components_jump

    def run(cache_jump_input: bool):
        fresh15.connected_components_jump = functools.partial(
            orig, cache_jump_input=cache_jump_input
        )
        try:
            t0 = time.time()
            rows = [
                tuple(r)
                for r in QUERIES["graph_components_jump"](spark, sf_dir).collect()
            ]
            wall = time.time() - t0
        finally:
            fresh15.connected_components_jump = orig
            caches.release()
        return wall, rows

    run(False)  # untimed warm-up (JVM/codegen; arm-neutral: shared plans)
    walls: dict[str, list[float]] = {"recompute": [], "cache_m": []}
    ref_rows = None
    for _ in range(reps):
        for label, knob in (("recompute", False), ("cache_m", True)):
            w, rows = run(knob)
            walls[label].append(round(w, 2))
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{label} diverged from first result"
    med_a = statistics.median(walls["recompute"])
    med_b = statistics.median(walls["cache_m"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "alternating A/B, median-of-%d per arm, untimed warm-up first, "
            "bit-identical census asserted per run" % reps
        ),
        "sf_dir": sf_dir,
        "constants": {"rounds": fresh15._CC_ROUNDS},
        "walls": walls,
        "median_recompute_s": med_a,
        "median_cache_m_s": med_b,
        "cache_m_over_recompute": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
        "n_census_rows": len(ref_rows or []),
    }
    out = REPO / "bench_runs" / "r17_ccjump_cachem_ab.json"
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median recompute={med_a}s cache_m={med_b}s "
        f"ratio={record['cache_m_over_recompute']}"
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
