"""Fixture-decade scaling curve for the round-7 query additions.

The r7 probe (`tools/scale_probe.py`) covers the dedup/similarity
candidate generators on a synthetic 10× corpus. The ten queries added
in round 7 lean on the OTHER fixture tables (events, orders/lineitem,
documents, embeddings), all of which ship at three scale factors —
sf0.001 / sf0.01 / sf0.1, a real 100× span — so their scaling evidence
can come straight from the driver-generated fixtures, no synthetic
corpus needed.

For each query this runs median-of-N wall time at every decade and
reports the 0.01→0.1 growth factor (the first decade is dominated by
fixed per-query cost: stage scheduling, codegen, broadcast setup — the
last decade is where the data term shows). A query whose plan hid a
quadratic term (all-pairs join, per-key blowup) would show a ≫10×
last-decade factor; the linear-shape hypothesis predicts ≤10×.

Usage::

    python tools/fixture_decades.py [runs]

Writes bench_runs/fixture_decades_r7.json and prints a markdown table
(consumed by BASELINE.md §(i)).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402

QUERIES = [
    "rel_bloom_join_pruned",
    "fn_date_gap_fill_daily",
    "txt_bm25_topk",
    "pipe_hash_split",
    "txt_unigram_surprisal",
    "emb_int8_quantize_error",
    "rel_cdc_latest_state",
    "rel_scd2_intervals",
    "graph_pagerank",
    "rel_funnel_conversion",
    "pipe_weighted_sample",
    "txt_shingle_novelty",
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("fixture_decades")
    qs = entry_mod.queries()

    # warm-up sweep (JVM/codegen/broadcast caches) outside the clock
    for name in QUERIES:
        qs[name](spark, SF_DIRS[0]).write.format("noop").mode("overwrite").save()
        caches.release()

    record: dict[str, dict] = {}
    for name in QUERIES:
        per_sf: dict[str, float] = {}
        for sf_dir in SF_DIRS:
            samples = []
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
                caches.release()
            per_sf[Path(sf_dir).name] = round(statistics.median(samples), 3)
        growth = (
            round(per_sf["sf0.1"] / per_sf["sf0.01"], 2)
            if per_sf["sf0.01"] > 0
            else -1.0
        )
        record[name] = {**per_sf, "last_decade_x": growth}
        print(
            f"| {name} | {per_sf['sf0.001']} | {per_sf['sf0.01']} | "
            f"{per_sf['sf0.1']} | {growth} |",
            flush=True,
        )

    out = REPO / "bench_runs" / "fixture_decades_r7.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({"runs": runs, "queries": record}, indent=1, sort_keys=True) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
