"""Shared A/B harness hygiene — the executable spread rule (VERDICT r17 #9).

Round 17 showed why medians alone cannot certify an alternating-arm A/B
on this box: when a co-tenant load decays across the session, the FIRST
arm's early runs absorb the contamination and the headline ratio
overstates the win (degree_census: recorded 0.517 from walls
union=[17.29, 15.93, 8.73] / explode=[21.07, 8.24, 7.33]; the sane
steady-state pair said ~0.84).  The builder's protocol already named the
rule — "spreads sane or the record is discarded" — but nothing enforced
it.  This module is the enforcement: harnesses must pass their per-arm
wall series through :func:`assert_sane_walls` BEFORE writing a record,
and retry (or refuse, exit 3) when it raises.

The two rejection conditions, from the r17 post-mortem:

- **wide spread** — max/min within one arm above ``max_spread`` (1.5x):
  whatever moved the box that much dominates the arm's median;
- **monotone decay** — a strictly decreasing series whose total drop
  exceeds ``max_decay`` (1.25x): the signature of a co-tenant ramping
  down THROUGH the session, which poisons arms asymmetrically even when
  each arm's raw spread looks tolerable.
"""

from __future__ import annotations


class SpreadError(RuntimeError):
    """An arm's wall series fails the hygiene rule; do not write a record."""


def arm_spread_violation(
    runs: list[float], *, max_spread: float = 1.5, max_decay: float = 1.25
) -> str | None:
    """Reason this arm's wall series is untrustworthy, or None if sane."""
    if len(runs) < 2:
        return None
    lo, hi = min(runs), max(runs)
    if lo <= 0:
        return f"non-positive wall in series {runs}"
    if hi / lo > max_spread:
        return f"spread {hi / lo:.2f}x exceeds {max_spread}x (runs {runs})"
    if all(b < a for a, b in zip(runs, runs[1:])) and runs[0] / runs[-1] > max_decay:
        return (
            f"monotone decay {runs[0] / runs[-1]:.2f}x exceeds {max_decay}x "
            f"(runs {runs}) — co-tenant ramp-down signature"
        )
    return None


def assert_sane_walls(
    walls: dict[str, list[float]],
    *,
    max_spread: float = 1.5,
    max_decay: float = 1.25,
) -> None:
    """Raise :class:`SpreadError` if any arm's series fails the rule."""
    problems = {
        label: reason
        for label, runs in walls.items()
        if (
            reason := arm_spread_violation(
                runs, max_spread=max_spread, max_decay=max_decay
            )
        )
    }
    if problems:
        raise SpreadError(
            "A/B record rejected by the spread rule; re-run in a quieter "
            f"window: {problems}"
        )
