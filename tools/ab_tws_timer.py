"""A/B: stream_stateful_sessions_tws — computed previous-timer delete
vs per-group listTimers paging (r18, guide §4 "fewer Python-boundary
round trips"). The r18 profile (OPTIMIZATION_r18.md) shows the stream's
dominant term is ``allUpdatesTimeMs`` — per-group Python handler time —
and the handler paid ~5 state-server RTTs per group per batch, one of
them a paged ``listTimers`` whose answer is a pure function of the
state the handler just read.

Arms flip ``streaming.stateful._TWS_COMPUTED_TIMER`` (captured as a
closure value at processor-factory time, so the patch reaches the
executors); the stream-shuffle pin is held at the PRE-r18 constant 8
for both arms so this record attributes the timer change alone
(tools/ab_stream_shuffle.py measures the pin change). Outputs asserted
bit-identical per run; spread rule enforced (tools/_abcommon.py).

Usage: python tools/ab_tws_timer.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_tws_timer_ab.json (exit 3 if no sane record).
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
from mapreduce_system_spark.streaming import stateful  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "stream_stateful_sessions_tws"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_tws_timer")
    orig = stateful._TWS_COMPUTED_TIMER
    orig_pin = fresh6._STREAM_SHUFFLE_PIN
    fresh6._STREAM_SHUFFLE_PIN = 8  # pre-r18 pin for BOTH arms (see doc)

    def run(computed: bool):
        stateful._TWS_COMPUTED_TIMER = computed
        try:
            # the stream replay runs eagerly inside the query call — the
            # clock opens before it (bench.py methodology)
            t0 = time.time()
            df = QUERIES[_QUERY](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            stateful._TWS_COMPUTED_TIMER = orig
            caches.release()
        return wall, out

    record = None
    try:
        for attempt in range(attempts):
            run(False)  # untimed warm-up, arm-neutral
            walls: dict[str, list[float]] = {"list_timers": [], "computed": []}
            ref = None
            for _ in range(reps):
                for label, computed in (("list_timers", False), ("computed", True)):
                    w, out = run(computed)
                    walls[label].append(round(w, 2))
                    if ref is None:
                        ref = out
                    assert out == ref, f"{label} diverged from first result"
            try:
                assert_sane_walls(walls)
            except SpreadError as e:
                print(
                    f"# attempt {attempt + 1}/{attempts} rejected: {e}",
                    file=sys.stderr,
                )
                continue
            med_a = statistics.median(walls["list_timers"])
            med_b = statistics.median(walls["computed"])
            record = {
                "protocol": (
                    "alternating A/B, median-of-%d per arm, untimed warm-up "
                    "first, clock opens before the eager stream replay, "
                    "stream shuffle pinned 8 on both arms, bit-identical "
                    "outputs asserted per run, spread rule enforced "
                    "(tools/_abcommon.py)" % reps
                ),
                "query": _QUERY,
                "sf_dir": sf_dir,
                "walls": walls,
                "median_list_timers_s": med_a,
                "median_computed_s": med_b,
                "computed_over_list": round(med_b / med_a, 3) if med_a else None,
                "identical_output": True,
                "attempts_rejected": attempt,
            }
            break
    finally:
        fresh6._STREAM_SHUFFLE_PIN = orig_pin
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_path = REPO / "bench_runs" / "r18_tws_timer_ab.json"
    out_path.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
