"""A/B: the streaming family's shuffle-partition pin — constant 8
(r12-era) vs scale-adaptive ``max(8, defaultParallelism)`` (r18, guide
§2 "make partitioning scale-adaptive"). The r18 TWS profile shows the
dominant per-batch term is per-group Python handler time
(``allUpdatesTimeMs`` ~1.4 s/batch spread over only 8 partitions),
which the constant pin caps at 8 concurrent Python workers on a
32-core master; the per-instance state-store overhead the 8 was sized
for is small since the RocksDB changelog adoption.

Arms flip ``queries.fresh6._STREAM_SHUFFLE_PIN`` (8 vs None=adaptive)
and time the three heaviest streaming-state queries back to back —
both sessionization twins route through the same pin, and
stream_stateful_user_totals covers the HDFS-provider shape. Outputs
asserted bit-identical per run; spread rule enforced.

Usage: python tools/ab_stream_shuffle.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_stream_shuffle_ab.json (exit 3 if no sane record).
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
from mapreduce_system_spark.queries import fresh6  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERIES = (
    "stream_stateful_sessions_tws",
    "stream_stateful_sessions",
    "stream_stateful_user_totals",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_stream_shuffle")
    orig = fresh6._STREAM_SHUFFLE_PIN

    def run(pin):
        fresh6._STREAM_SHUFFLE_PIN = pin
        outs, wall = [], 0.0
        try:
            for name in _QUERIES:
                # stream replays run eagerly inside the query call — the
                # clock opens before each (bench.py methodology)
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                wall += time.time() - t0
                outs.append([tuple(r) for r in df.collect()])
                caches.release()
        finally:
            fresh6._STREAM_SHUFFLE_PIN = orig
        return wall, outs

    record = None
    for attempt in range(attempts):
        run(8)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"pin8": [], "adaptive": []}
        ref = None
        for _ in range(reps):
            for label, pin in (("pin8", 8), ("adaptive", None)):
                w, outs = run(pin)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = outs
                assert outs == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["pin8"])
        med_b = statistics.median(walls["adaptive"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, wall = sum over the three streaming-state queries, "
                "clock opens before each eager stream replay, bit-identical "
                "outputs asserted per run, spread rule enforced "
                "(tools/_abcommon.py)" % reps
            ),
            "queries": list(_QUERIES),
            "sf_dir": sf_dir,
            "ncpu_master": spark.sparkContext.defaultParallelism,
            "walls": walls,
            "median_pin8_s": med_a,
            "median_adaptive_s": med_b,
            "adaptive_over_pin8": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_path = REPO / "bench_runs" / "r18_stream_shuffle_ab.json"
    out_path.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
