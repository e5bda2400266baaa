"""Capture ``.explain("formatted")`` plans for named queries.

Writes ``plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt`` (default
round r18) for each requested query — the before/after plan evidence
the optimization round commits alongside the code (the judge checks
plan claims against these files).

Usage: python tools/capture_plans.py <tag> [sf_dir] <query> [query ...]
       python tools/capture_plans.py before /root/testdata/sf0.1 graph_k_truss
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.plans.checks import formatted_plan  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest and rest[0].startswith("/"):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    import os

    round_tag = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18")
    out_dir = REPO / "plans" / round_tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        (out_dir / f"{name}_{tag}.txt").write_text(formatted_plan(df) + "\n")
        caches.release()
        print(f"wrote plans/{round_tag}/{name}_{tag}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
