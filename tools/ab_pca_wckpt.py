"""A/B: emb_pca_topk_deflation — per-round d-row checkpoint of the
loading iterate ``w`` (r18) vs the pre-r18 shape where the norm subtree
and the final-round norm checkpoint re-ran the corpus aggregates
(VERDICT r17 #8, guide §5).

Arms flip ``pca_topk(checkpoint_w=...)`` via functools-style patching;
outputs asserted bit-identical per run; noop-sink timing; spread rule
enforced (tools/_abcommon.py).

Usage: python tools/ab_pca_wckpt.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_pca_wckpt_ab.json (exit 3 if no sane record).
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
from mapreduce_system_spark.queries import graphml  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "emb_pca_topk_deflation"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_pca_wckpt")
    orig = graphml.pca_topk

    def run(ckpt: bool):
        def patched(*a, **kw):
            kw["checkpoint_w"] = ckpt
            return orig(*a, **kw)

        graphml.pca_topk = patched
        try:
            t0 = time.time()
            df = QUERIES[_QUERY](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            graphml.pca_topk = orig
            caches.release()
        return wall, out

    # NOTE: pca_topk runs eager per-round checkpoint jobs inside the
    # query CALL, so the clock opens before the call (unlike the lazy
    # queries, where plan construction is free) — both arms measured
    # identically.
    record = None
    for attempt in range(attempts):
        run(False)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"lazy_w": [], "ckpt_w": []}
        ref = None
        for _ in range(reps):
            for label, ckpt in (("lazy_w", False), ("ckpt_w", True)):
                w, out = run(ckpt)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["lazy_w"])
        med_b = statistics.median(walls["ckpt_w"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, noop-sink timing (clock includes the eager "
                "checkpoint jobs of the query call), bit-identical outputs "
                "asserted per run, spread rule enforced "
                "(tools/_abcommon.py)" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_lazy_w_s": med_a,
            "median_ckpt_w_s": med_b,
            "ckpt_over_lazy": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_pca_wckpt_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median lazy_w={record['median_lazy_w_s']}s "
        f"ckpt_w={record['median_ckpt_w_s']}s "
        f"ratio={record['ckpt_over_lazy']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
