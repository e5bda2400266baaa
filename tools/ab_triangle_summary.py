"""A/B: triangle_stats summary — four separate one-row aggregates
crossJoined (pre-r18: nodes, edges, tri, wed — three of them broadcast
subtrees racing to fill the pr/deg caches at action start) vs the r18
form where node count and wedge count ride ONE aggregate over the
cached degree table (§2.4 — one less pass, one less concurrent
broadcast subtree).

Arms patch ``operators.graph.triangle_stats`` (the A arm is the pre-r18
body, verbatim); drives graph_triangle_count; outputs asserted
bit-identical per run; noop-sink timing; spread rule enforced.

Usage: python tools/ab_triangle_summary.py [sf_dir] [reps] [attempts]
Writes bench_runs/r18_triangle_summary_ab.json (exit 3 if no sane record).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.caches import tracked_cache  # noqa: E402
from mapreduce_system_spark.operators import graph as G  # noqa: E402
from mapreduce_system_spark.queries import fresh8f  # noqa: E402
from mapreduce_system_spark.registry import QUERIES  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from tools._abcommon import SpreadError, assert_sane_walls  # noqa: E402

_QUERY = "graph_triangle_count"


def _four_agg_triangle_stats(pr: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """The pre-r18 spelling, kept here verbatim as the A arm."""
    pr = tracked_cache(pr.select(F.col(u).alias("u"), F.col(v).alias("v")))
    deg = tracked_cache(G.degree_census(pr))
    eo = tracked_cache(G.orient_by_degree(pr, deg))
    e1, e2 = eo.alias("e1"), eo.alias("e2")
    wedges = e1.join(
        e2, (F.col("e1.s") == F.col("e2.s")) & (F.col("e1.t") < F.col("e2.t"))
    ).select(F.col("e1.t").alias("a"), F.col("e2.t").alias("b"))
    tri = wedges.join(
        pr.hint("shuffle_hash"), (F.col("u") == F.col("a")) & (F.col("v") == F.col("b"))
    ).agg(F.count("*").alias("n_triangles"))
    wed = deg.agg(
        F.coalesce(F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("n_wedges")
    )
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    edges = pr.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(wed))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
            .alias("transitivity"),
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab_triangle_summary")
    new_form = G.triangle_stats

    def run(form):
        # fresh8f imported the symbol into its own namespace — patch THERE
        fresh8f.triangle_stats = form
        try:
            df = QUERIES[_QUERY](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            out = [tuple(r) for r in df.collect()]
        finally:
            fresh8f.triangle_stats = new_form
            caches.release()
        return wall, out

    arms = (("four_agg", _four_agg_triangle_stats), ("merged", new_form))
    record = None
    for attempt in range(attempts):
        run(_four_agg_triangle_stats)  # untimed warm-up, arm-neutral
        walls: dict[str, list[float]] = {"four_agg": [], "merged": []}
        ref = None
        for _ in range(reps):
            for label, form in arms:
                w, out = run(form)
                walls[label].append(round(w, 2))
                if ref is None:
                    ref = out
                assert out == ref, f"{label} diverged from first result"
        try:
            assert_sane_walls(walls)
        except SpreadError as e:
            print(f"# attempt {attempt + 1}/{attempts} rejected: {e}", file=sys.stderr)
            continue
        med_a = statistics.median(walls["four_agg"])
        med_b = statistics.median(walls["merged"])
        record = {
            "protocol": (
                "alternating A/B, median-of-%d per arm, untimed warm-up "
                "first, noop-sink timing, bit-identical outputs asserted "
                "per run, spread rule enforced (tools/_abcommon.py)" % reps
            ),
            "query": _QUERY,
            "sf_dir": sf_dir,
            "walls": walls,
            "median_four_agg_s": med_a,
            "median_merged_s": med_b,
            "merged_over_four_agg": round(med_b / med_a, 3) if med_a else None,
            "identical_output": True,
            "attempts_rejected": attempt,
        }
        break
    if record is None:
        print("# no sane record after all attempts — box too noisy", file=sys.stderr)
        return 3
    out_p = REPO / "bench_runs" / "r18_triangle_summary_ab.json"
    out_p.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(json.dumps(record["walls"]))
    print(
        f"median four_agg={record['median_four_agg_s']}s "
        f"merged={record['median_merged_s']}s "
        f"ratio={record['merged_over_four_agg']}"
    )
    print(f"wrote {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
