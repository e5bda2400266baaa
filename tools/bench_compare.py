"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage::

    python tools/bench_compare.py OLD.json NEW.json [threshold]
    python tools/bench_compare.py --table OLD.json NEW.json [threshold]

Accepts either a raw bench.py line or a driver BENCH_r*.json wrapper
(the JSON is extracted by regex from whatever surrounds it). Queries
slower than ``threshold``× (default 1.5) are listed; new/removed queries
are reported separately so "faster because fewer ran" is visible.
Exit code 1 when any regression crosses the threshold.

``--table`` prints a markdown table of EVERY per-query move beyond the
threshold (default 1.4 in this mode) in EITHER direction — the generated
round-notes table BASELINE.md must carry verbatim, so an adverse row can
never be silently omitted from the record the way r8's 4.2×
``mm_blob_features`` move was (VERDICT r8 #3). Sub-0.5 s baselines are
still skipped as documented noise, but ANY entry whose new time exceeds
2 s is reported regardless of its baseline so a noise-class query cannot
grow large silently. Removed and newly-FAILING queries print as
explicit table rows ("faster because fewer ran" must be visible), and
the exit code matches the default mode: 1 when any regression, removed,
or failed row exists.
"""

from __future__ import annotations

import json
import re
import sys

# Documented bimodal queries (VERDICT r11 "what's wrong" #2): their
# SWEEP medians oscillate with unchanged code — graph_triangle_count's
# full-catalog sweep readings ranged 4.2–6.2 s across r10/r11 while its
# ISOLATED median-of-3 stayed flat. ROOT-CAUSED r12 (measured, not the
# r11 GC/AQE guess): the immediate predecessor is irrelevant — running
# triangle after emb_hof_vector_stats / rel_table_profile /
# dedup_minhash_lsh / nothing gives overlapping 4.0–5.1 s spreads — but
# its COLD run costs ~2x (9.0 s first execution in a fresh session vs
# 4.1–4.9 warm): the query's generated-code compilation is unusually
# heavy, and a full-catalog sweep is exactly the regime where 160 other
# queries age its compiled classes out between sweeps, so each sweep
# re-pays a rotation-dependent fraction of the JIT cost. Protocol: a
# sweep-to-sweep move on these queries inside BAND is a protocol row,
# NOT a regression; confirm any suspicion with
# ``SPARK_GRAFT_BENCH_RUNS=3 python bench.py <query>`` (isolated) before
# chasing it. Moves BEYOND the band are real regressions even here —
# the band is the measured oscillation envelope (6.2/4.2 ≈ 1.48, and the
# cold/warm ratio ~2.0 bounds the worst case), not a blanket exemption.
ISOLATED_MEDIAN_QUERIES = {"graph_triangle_count"}
ISOLATED_MEDIAN_BAND = 1.6


def load(path: str) -> dict:
    raw = open(path).read()
    try:  # bench_runs/*.json are plain (pretty-printed) bench records
        d = json.loads(raw)
        # a bench record's "queries" maps name -> seconds; reject other
        # artifact families that also carry a "queries" key (e.g. the
        # verify_full_*.json status maps) with the clean error below
        # instead of a TypeError deep inside moves()
        if (
            isinstance(d, dict)
            and "value" in d
            and isinstance(d.get("queries"), dict)
            and all(
                v is None or isinstance(v, (int, float))
                for v in d["queries"].values()
            )
        ):
            return d
    except ValueError:
        pass
    m = re.search(r'\{\\?"metric\\?".*', raw)
    if m is None:
        raise SystemExit(f"no bench JSON found in {path}")
    txt = m.group(0)
    if txt.startswith('{\\"'):  # driver wrapper embeds it string-escaped
        txt = txt.encode().decode("unicode_escape")
    return json.loads(re.search(r'\{"metric".*\}', txt).group(0))


def moves(old: dict, new: dict, threshold: float) -> tuple[list[tuple], list[tuple]]:
    """(moves, protocol): every shared query whose ratio leaves
    [1/threshold, threshold] — except that a bimodal query's in-band
    move (ISOLATED_MEDIAN_QUERIES) lands in ``protocol`` instead of
    ``moves``. ONE band evaluation feeds both lists so the suppression
    and the re-surfacing can never drift apart (the r8 silent-omission
    class).

    Skips sub-0.5 s baselines (documented host noise) unless the new
    time is over 2 s — a formerly-trivial query that grew big is exactly
    the move the table exists to surface.
    """
    oq, nq = old["queries"], new["queries"]
    out: list[tuple] = []
    protocol: list[tuple] = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a is None or b is None or a <= 0 or b <= 0:
            continue
        if a < 0.5 and b <= 2.0:
            continue
        r = b / a
        if r > threshold or r < 1.0 / threshold:
            in_band = 1.0 / ISOLATED_MEDIAN_BAND <= r <= ISOLATED_MEDIAN_BAND
            if name in ISOLATED_MEDIAN_QUERIES and in_band:
                protocol.append((name, a, b, r))
            else:
                out.append((name, a, b, r))
    return sorted(out, key=lambda x: -x[3]), sorted(protocol, key=lambda x: -x[3])


def ambient_note(rec: dict, label: str) -> str | None:
    """One-line ambient annotation from a record's load-average markers
    (VERDICT r14 #4 — band points must be self-explaining). A 1-min
    start load above ~1.5x the box's core count means another workload
    was running when the sweep began (the sweep itself contributes up to
    ~ncpu): the record is a BAND point, not a floor reading. Records
    predating the markers (pre-r15) annotate as unknown."""
    la, lb = rec.get("loadavg_start"), rec.get("loadavg_end")
    if not la or not lb:
        return f"ambient {label}: unknown (record predates loadavg markers)"
    ncpu = rec.get("ncpu") or 32
    worst = max(la[0], lb[0])
    flag = " ** CONTAMINATED sweep — treat as band point **" if (
        worst > 1.5 * ncpu
    ) else ""
    return (
        f"ambient {label}: loadavg start {la} end {lb} "
        f"(ncpu {ncpu}){flag}"
    )


def print_table(old: dict, new: dict, threshold: float) -> bool:
    """Print the round-notes table; True when any adverse signal exists.

    A move table that omitted removed or newly-failing queries would
    re-open the r8 silent-omission hole from the other side ("faster
    because fewer ran"), so those are printed as explicit rows too.
    """
    oq, nq = old["queries"], new["queries"]
    # one band evaluation: in-band bimodal moves come back as `protocol`
    # rows — still printed (a silently-omitted row is the r8 hole this
    # mode exists to close) but never flipping the exit code
    rows, protocol = moves(old, new, threshold)
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    failed = sorted(
        n
        for n in set(oq) & set(nq)
        if (nq[n] is None or nq[n] < 0) and (oq[n] is not None and oq[n] >= 0)
    )
    print(
        f"| query | old s | new s | ratio | direction |\n|---|---|---|---|---|"
    )
    if not (rows or protocol or removed or failed):
        print(f"| _none_ | — | — | — | no move beyond {threshold}x |")
    for name, a, b, r in rows:
        d = "REGRESSION" if r > 1 else "improvement"
        print(f"| `{name}` | {a:.2f} | {b:.2f} | {r:.2f}x | {d} |")
    for name, a, b, r in protocol:
        print(
            f"| `{name}` | {a:.2f} | {b:.2f} | {r:.2f}x | "
            f"bimodal — isolated-median protocol (tools/bench_compare.py) |"
        )
    for name in failed:
        print(f"| `{name}` | {oq[name]:.2f} | — | — | **FAILED** |")
    for name in removed:
        print(f"| `{name}` | {oq[name]:.2f} | — | — | **REMOVED** |")
    if added:
        print(f"\nadded ({len(added)}): {', '.join(f'`{n}`' for n in added)}")
    print(
        f"\ntotals: {old['value']}s/{len(old['queries'])}q -> "
        f"{new['value']}s/{len(new['queries'])}q  "
        f"(failures {old.get('failures', '?')} -> {new.get('failures', '?')})"
    )
    for rec, label in ((old, "old"), (new, "new")):
        note = ambient_note(rec, label)
        if note:
            print(note)
    regressions = [m for m in rows if m[3] > 1]
    return bool(regressions or removed or failed)


def main() -> int:
    argv = list(sys.argv[1:])
    table = "--table" in argv
    if table:
        argv.remove("--table")
    if len(argv) < 2:
        print(__doc__)
        return 2
    old, new = load(argv[0]), load(argv[1])
    threshold = float(argv[2]) if len(argv) > 2 else (1.4 if table else 1.5)
    if table:
        # same exit contract as the default mode: the table is for the
        # round notes, but a caller gating on the exit code must still
        # see adverse rows (regression/removed/failed) as nonzero
        return 1 if print_table(old, new, threshold) else 0
    oq, nq = old["queries"], new["queries"]
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions = [m for m in moves(old, new, threshold)[0] if m[3] > 1]
    print(
        f"old: {old['value']}s/{len(oq)}q  new: {new['value']}s/{len(nq)}q  "
        f"(failures {old.get('failures', '?')} -> {new.get('failures', '?')})"
    )
    for rec, label in ((old, "old"), (new, "new")):
        note = ambient_note(rec, label)
        if note:
            print(note)
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    for name, a, b, r in regressions:
        print(f"REGRESSION {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if not regressions:
        print(f"no per-query regression > {threshold}x")
    return 1 if regressions or removed else 0


if __name__ == "__main__":
    raise SystemExit(main())
