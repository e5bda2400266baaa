"""Like-for-like sweep comparison table for OPTIMIZATION_r*.md.

Usage: python tools/bench_table.py bench_runs/r17a.json bench_runs/r18a.json [minsec]

Prints per-query prev/now/ratio rows (descending by now-seconds, queries
below ``minsec`` in BOTH records folded into one tail row), the total,
and the geomean ratio — pure Python, no Spark.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    minsec = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda q: -qb[q])
    geo = math.exp(
        sum(math.log(qb[q] / qa[q]) for q in common if qa[q] > 0 and qb[q] > 0)
        / len(common)
    )
    print(f"| query | {sys.argv[1]} | {sys.argv[2]} | ratio |")
    print("|---|---|---|---|")
    tail_a = tail_b = 0.0
    tail_n = 0
    for q in common:
        if qa[q] < minsec and qb[q] < minsec:
            tail_a += qa[q]
            tail_b += qb[q]
            tail_n += 1
            continue
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {qb[q] / qa[q]:.2f} |")
    print(
        f"| ({tail_n} queries < {minsec}s) | {tail_a:.1f} | {tail_b:.1f} | "
        f"{tail_b / tail_a:.2f} |"
    )
    print(f"| TOTAL | {a['value']:.1f} | {b['value']:.1f} | {b['value'] / a['value']:.2f} |")
    print(f"geomean ratio over {len(common)} common queries: {geo:.3f}")
    print(
        f"loadavg_start {sys.argv[1]}: {a.get('loadavg_start')} | "
        f"{sys.argv[2]}: {b.get('loadavg_start')}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
