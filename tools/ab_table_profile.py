"""A/B: rel_table_profile — string min/max folded into the one-row
mega-aggregate (status quo: the immutable string buffers demote the
whole aggregate, Expanded distinct rows included, to SortAggregate) vs
split into a slim grouping-free second pass crossJoined back (the
mega-aggregate then hash-aggregates the expanded rows unsorted).

Profile rows asserted bit-identical per run.

Protocol: one untimed warm-up, then ALTERNATING A/B runs (3 each);
medians decide; the record commits either way.

Usage: python tools/ab_table_profile.py [sf_dir] [reps]
Writes bench_runs/r17_table_profile_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.queries.fresh8g import q_table_profile  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import assert_sane_walls  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_table_profile")

    def run(split: bool):
        t0 = time.time()
        rows = [
            tuple(r)
            for r in q_table_profile(
                spark, sf_dir, split_string_extrema=split
            ).collect()
        ]
        wall = time.time() - t0
        caches.release()
        return wall, rows

    run(False)  # untimed warm-up (JVM/codegen; arm-neutral)
    walls: dict[str, list[float]] = {"folded": [], "split": []}
    ref_rows = None
    for _ in range(reps):
        for label, split in (("folded", False), ("split", True)):
            w, rows = run(split)
            walls[label].append(round(w, 2))
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{label} diverged from first result"
    med_a = statistics.median(walls["folded"])
    med_b = statistics.median(walls["split"])
    # refuse to write a record whose wall series fails the spread
    # rule (VERDICT r17 #9 — the executable hygiene check)
    assert_sane_walls(walls)
    record = {
        "protocol": (
            "alternating A/B, median-of-%d per arm, untimed warm-up first, "
            "bit-identical profile rows asserted per run" % reps
        ),
        "sf_dir": sf_dir,
        "walls": walls,
        "median_folded_s": med_a,
        "median_split_s": med_b,
        "split_over_folded": round(med_b / med_a, 3) if med_a else None,
        "identical_output": True,
        "n_rows": len(ref_rows or []),
    }
    out = REPO / "bench_runs" / "r17_table_profile_ab.json"
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(f"median folded={med_a}s split={med_b}s ratio={record['split_over_folded']}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
