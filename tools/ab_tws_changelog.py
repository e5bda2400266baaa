"""A/B: stream_stateful_sessions_tws — RocksDB changelog checkpointing
on vs off (VERDICT r17 #4, guide §5 state/spill). The heaviest streaming
query (10.3 s quiet r17a); the r17 builder bounded the expected win at
"well under a second" for a 2-3 micro-batch replay and deferred the
measurement — this harness takes it.

Arms flip ``queries.fresh6._TWS_CHANGELOG_CKPT``; outputs asserted
bit-identical per run (the query returns a checkpointed batch frame, so
collect is the natural action here — same as the oracle gate's read);
spread rule enforced (tools/_abcommon.py).

Usage: python tools/ab_tws_changelog.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_tws_changelog_ab.json (exit 3 if no sane record).
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

_QUERY = "stream_stateful_sessions_tws"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_tws_changelog")
    orig = fresh6._TWS_CHANGELOG_CKPT

    def run(enabled: bool):
        fresh6._TWS_CHANGELOG_CKPT = enabled
        try:
            # the stream replay runs eagerly inside the query call — the
            # clock opens before it (bench.py methodology)
            t0 = time.time()
            df = QUERIES[_QUERY](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            fresh6._TWS_CHANGELOG_CKPT = orig
            caches.release()
        return wall, out

    record = None
    for attempt in range(attempts):
        run(False)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"snapshot": [], "changelog": []}
        ref = None
        for _ in range(reps):
            for label, enabled in (("snapshot", False), ("changelog", True)):
                w, out = run(enabled)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["snapshot"])
        med_b = statistics.median(walls["changelog"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, clock opens before the eager stream replay, "
                "bit-identical outputs asserted per run, spread rule "
                "enforced (tools/_abcommon.py)" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_snapshot_s": med_a,
            "median_changelog_s": med_b,
            "changelog_over_snapshot": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_tws_changelog_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median snapshot={record['median_snapshot_s']}s "
        f"changelog={record['median_changelog_s']}s "
        f"ratio={record['changelog_over_snapshot']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
