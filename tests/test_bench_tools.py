"""bench_compare ambient annotation (VERDICT r14 #4): committed sweep
records carry loadavg markers; the comparator must annotate both
records and flag a contaminated sweep so a band point can never read as
a floor regression. Pure-Python — no Spark session."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bench_compare import ambient_note  # noqa: E402


def test_ambient_note_flags_contaminated_sweep():
    rec = {
        "loadavg_start": [80.0, 40.0, 20.0],
        "loadavg_end": [33.0, 35.0, 30.0],
        "ncpu": 32,
    }
    note = ambient_note(rec, "new")
    assert "CONTAMINATED" in note
    assert "80.0" in note


def test_ambient_note_clean_sweep_not_flagged():
    # the sweep itself drives load up to ~ncpu; that is NOT contamination
    rec = {
        "loadavg_start": [31.5, 20.0, 10.0],
        "loadavg_end": [40.0, 33.0, 25.0],
        "ncpu": 32,
    }
    note = ambient_note(rec, "old")
    assert "CONTAMINATED" not in note
    assert "loadavg start" in note


def test_ambient_note_pre_r15_records_annotate_unknown():
    assert "unknown" in ambient_note({"queries": {}}, "old")
