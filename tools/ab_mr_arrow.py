"""A/B: mr_generic_contract_word_count reduce phase — applyInPandas (one
pandas frame per key-group, the pre-r18 form) vs applyInArrow (one Arrow
table per key-group, skipping the per-group pandas materialization) —
VERDICT r17 #7, guide §4.

Arms flip ``map_reduce_scalable(arrow_groups=...)`` via functools.partial
patching; outputs asserted bit-identical per run; noop-sink timing;
spread rule enforced (tools/_abcommon.py).

Usage: python tools/ab_mr_arrow.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_mr_arrow_ab.json (exit 3 if no sane record).
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
from mapreduce_system_spark.operators import mapreduce as MR  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "mr_generic_contract_word_count"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_mr_arrow")
    orig = MR.map_reduce_scalable

    def run(arrow: bool):
        def patched(*a, **kw):
            kw["arrow_groups"] = arrow
            return orig(*a, **kw)

        MR.map_reduce_scalable = patched
        try:
            df = QUERIES[_QUERY](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            MR.map_reduce_scalable = orig
            caches.release()
        return wall, out

    record = None
    for attempt in range(attempts):
        run(False)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"pandas": [], "arrow": []}
        ref = None
        for _ in range(reps):
            for label, arrow in (("pandas", False), ("arrow", True)):
                w, out = run(arrow)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["pandas"])
        med_b = statistics.median(walls["arrow"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, noop-sink timing, bit-identical outputs asserted "
                "per run, spread rule enforced (tools/_abcommon.py)" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_pandas_s": med_a,
            "median_arrow_s": med_b,
            "arrow_over_pandas": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_mr_arrow_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median pandas={record['median_pandas_s']}s "
        f"arrow={record['median_arrow_s']}s "
        f"ratio={record['arrow_over_pandas']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
