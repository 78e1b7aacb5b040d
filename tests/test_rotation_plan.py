"""Policy invariants for tools/rotation_plan.py (the reproducible driver-
window planner): no Spark session needed — it reads CORRECTNESS_r*.json and
the registry tags only."""

from __future__ import annotations

import importlib.util
import os

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "rotation_plan", os.path.join(_here, "tools", "rotation_plan.py")
)
rotation_plan = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and rotation_plan)


def test_window_is_exact_size_and_duplicate_free():
    window, debt = rotation_plan.plan(current_round=7, slots=50, recert_slots=10, force=[])
    names = [n for n, _ in window]
    assert len(names) == 50
    assert len(set(names)) == 50
    assert debt["registry"] >= 410


def test_forced_entries_lead_the_window():
    window, _ = rotation_plan.plan(
        current_round=7, slots=50, recert_slots=10, force=["q406_pixel_decode"]
    )
    assert window[0][0] == "q406_pixel_decode"
    assert "forced" in window[0][1]


def test_recert_tier_picks_oldest_evidence_first():
    window, _ = rotation_plan.plan(current_round=7, slots=50, recert_slots=10, force=[])
    recerts = [(n, why) for n, why in window if why.startswith("re-cert")]
    assert len(recerts) == 10
    ledger = rotation_plan.load_ledger()
    ages = [ledger[n] for n, _ in recerts]
    assert ages == sorted(ages)  # oldest rounds first
    # every scheduled re-cert would actually breach the ceiling next round
    assert all(7 + 1 - a > rotation_plan.MAX_AGE_ROUNDS for a in ages)


def test_never_certified_tier_only_contains_uncertified_queries():
    window, _ = rotation_plan.plan(current_round=7, slots=50, recert_slots=10, force=[])
    ledger = rotation_plan.load_ledger()
    for name, why in window:
        if why.startswith("never-certified"):
            assert name not in ledger
