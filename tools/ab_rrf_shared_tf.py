"""A/B: txt_rrf_fusion — coverage system derived from BM25's shared tf
postings table (r18) vs the pre-r18 second tokenize pass + distinct
(VERDICT r17 #5, guide §2.3/§2.4 — do fewer corpus passes).

Arms flip ``queries.fresh11._RRF_SHARED_TF``; outputs asserted
bit-identical per run; noop-sink timing; spread rule enforced
(tools/_abcommon.py).

Usage: python tools/ab_rrf_shared_tf.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_rrf_shared_tf_ab.json (exit 3 if no sane record).
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
from mapreduce_system_spark.queries import fresh11  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "txt_rrf_fusion"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_rrf_shared_tf")
    orig = fresh11._RRF_SHARED_TF

    def run(shared: bool):
        fresh11._RRF_SHARED_TF = shared
        try:
            df = QUERIES[_QUERY](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            fresh11._RRF_SHARED_TF = orig
            caches.release()
        return wall, out

    record = None
    for attempt in range(attempts):
        run(False)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"two_pass": [], "shared_tf": []}
        ref = None
        for _ in range(reps):
            for label, shared in (("two_pass", False), ("shared_tf", True)):
                w, out = run(shared)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["two_pass"])
        med_b = statistics.median(walls["shared_tf"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, noop-sink timing, bit-identical outputs asserted "
                "per run, spread rule enforced (tools/_abcommon.py)" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_two_pass_s": med_a,
            "median_shared_tf_s": med_b,
            "shared_over_two_pass": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_rrf_shared_tf_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median two_pass={record['median_two_pass_s']}s "
        f"shared_tf={record['median_shared_tf_s']}s "
        f"ratio={record['shared_over_two_pass']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
