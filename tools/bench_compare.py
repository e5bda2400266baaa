"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage::

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts either a raw bench.py line or a driver BENCH_r*.json wrapper
(the JSON is extracted by regex from whatever surrounds it). Queries
slower than ``threshold``× (default 1.5) are listed; new/removed queries
are reported separately so "faster because fewer ran" is visible.
Exit code 1 when any regression crosses the threshold.

Per BASELINE.md §(e): totals on this host swing ±30% with co-tenant
load, so compare per-query ratios within same-session runs and treat
sub-second entries as noise (they are skipped below 0.5 s baseline).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    raw = open(path).read()
    m = re.search(r'\{\\?"metric\\?".*', raw)
    if m is None:
        raise SystemExit(f"no bench JSON found in {path}")
    txt = m.group(0)
    if txt.startswith('{\\"'):  # driver wrapper embeds it string-escaped
        txt = txt.encode().decode("unicode_escape")
    return json.loads(re.search(r'\{"metric".*\}', txt).group(0))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a is None or b is None or a < 0.5 or b <= 0:
            continue  # failed entries / sub-noise baselines
        if b / a > threshold:
            regressions.append((name, a, b, b / a))
    print(
        f"old: {old['value']}s/{len(oq)}q  new: {new['value']}s/{len(nq)}q  "
        f"(failures {old.get('failures', '?')} -> {new.get('failures', '?')})"
    )
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    for name, a, b, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"REGRESSION {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if not regressions:
        print(f"no per-query regression > {threshold}x")
    return 1 if regressions or removed else 0


if __name__ == "__main__":
    raise SystemExit(main())
