"""Policy invariants for tools/rotation_plan.py (the reproducible driver-
window planner): no Spark session needed — it reads CORRECTNESS_r*.json and
the registry tags only.

Since round 8 the planner encodes the ID-LEVEL steady-state policy
(VERDICT r7 item 3): the hard age ceiling applies to SURVEY §2 operator IDs
(newest green row among queries tagged with the ID, <= ID_MAX_AGE_ROUNDS
rounds stale), the re-cert tier is sized by the breach list via set-cover,
and leftover slots burn down never-certified registry queries.
"""

from __future__ import annotations

import importlib.util
import os

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "rotation_plan", os.path.join(_here, "tools", "rotation_plan.py")
)
rotation_plan = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and rotation_plan)


def _specs():
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    return all_queries()


def test_window_is_exact_size_and_duplicate_free():
    window, debt = rotation_plan.plan(current_round=8, slots=50, recert_slots=None, force=[])
    names = [e["name"] for e in window]
    assert len(names) == 50
    assert len(set(names)) == 50
    assert debt["registry"] >= 410


def test_forced_entries_lead_the_window():
    window, _ = rotation_plan.plan(
        current_round=8, slots=50, recert_slots=None, force=["q406_pixel_decode"]
    )
    assert window[0]["name"] == "q406_pixel_decode"
    assert window[0]["tier"] == "F"
    assert "forced" in window[0]["why"]


def test_recert_tier_zeroes_id_breaches():
    """Every ID that would breach the ceiling next round is either
    re-certified by a scheduled slot or reported — after a full 50-slot
    plan the residual breach list must be empty (the policy's invariant)."""
    window, debt = rotation_plan.plan(current_round=8, slots=50, recert_slots=None, force=[])
    assert debt["id_breaches_after_window"] == 0
    # and each scheduled re-cert actually covers at least one breaching ID
    specs = _specs()
    ledger = rotation_plan.load_ledger()
    id_newest: dict[str, int] = {}
    for q, r in ledger.items():
        if q in specs:
            for t in specs[q].tags:
                id_newest[t] = max(r, id_newest.get(t, 0))
    breaching = {
        t for t, r in id_newest.items() if 8 + 1 - r > rotation_plan.ID_MAX_AGE_ROUNDS
    }
    for e in window:
        if e["tier"] == "R":
            gained = set(specs[e["name"]].tags) & breaching
            assert gained, f"{e['name']} re-certifies no breaching ID"
            # the entry's own `ids` must be exactly the breaching IDs it gains
            assert set(e["ids"]) == gained
            breaching -= gained
    assert not breaching


def test_never_certified_tier_only_contains_uncertified_queries():
    window, _ = rotation_plan.plan(current_round=8, slots=50, recert_slots=None, force=[])
    ledger = rotation_plan.load_ledger()
    for e in window:
        if e["tier"] == "N":
            assert e["name"] not in ledger


def test_backlog_fill_prefers_never_certified_lowest_number():
    window, _ = rotation_plan.plan(current_round=8, slots=50, recert_slots=None, force=[])
    ledger = rotation_plan.load_ledger()
    fills = [e["name"] for e in window if e["tier"] == "B"]
    never_fills = [n for n in fills if n not in ledger]
    # never-certified fills come first and ascend by query number
    assert fills[: len(never_fills)] == never_fills
    nums = [rotation_plan.qnum(n) for n in never_fills]
    assert nums == sorted(nums)


def test_emit_window_block_is_executable_and_order_preserving():
    """--emit-window (r12, VERDICT r11 item 6): the emitted block must be
    valid Python whose _WINDOW_PRIORITY tuple equals the plan's order
    exactly — rotation is a copy, not a transcription — with one tier
    header per tier in plan order."""
    window, debt = rotation_plan.plan(
        current_round=8, slots=50, recert_slots=None, force=["q406_pixel_decode"]
    )
    block = rotation_plan.emit_window(window, debt, current_round=8)
    ns: dict = {}
    exec(block, ns)  # noqa: S102 — our own generated source
    assert list(ns["_WINDOW_PRIORITY"]) == [e["name"] for e in window]
    tier_seq = [e["tier"] for e in window]
    tiers_in_order = [t for i, t in enumerate(tier_seq) if i == 0 or tier_seq[i - 1] != t]
    assert len(tiers_in_order) == len(set(tiers_in_order))  # tiers contiguous
    for t in tiers_in_order:
        assert f"# -- Tier {t} (r8):" in block
    assert block.count("# -- Tier") == len(tiers_in_order)


def _live_round() -> int:
    """The round the live window will RUN in: newest TRACKED CORRECTNESS
    record + 1.  Tracked-only (git ls-files) so a driver-emitted untracked
    artifact cannot flip the suite red outside the rotation workflow
    (ADVICE r11 item 3): the round boundary is now crossed by the explicit
    round-open commit of the driver artifacts, after which the stale-window
    test demands the new rotation — the designed, actionable failure.
    Falls back to a filesystem glob when git is unavailable (e.g. an
    exported tree)."""
    import glob
    import re
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", _here, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.split()
    except (OSError, subprocess.SubprocessError):
        out = []
    files = out or glob.glob(os.path.join(_here, "CORRECTNESS_r*.json"))
    rounds = [int(re.search(r"_r0*(\d+)\.json$", f).group(1)) for f in files]
    return max(rounds) + 1


def test_live_window_contains_planner_mandatory_tiers():
    """_WINDOW_PRIORITY must contain every re-cert and never-certified-ID
    slot the planner computes for the CURRENT round (derived from the
    newest CORRECTNESS record, so this cannot silently go stale — r11;
    previously pinned round 8 and went vacuous as the ledger freshened).
    Tier-B backlog fills may be displaced by mid-round forced additions —
    documented precedent since r6 — so only tiers R and N are asserted."""
    import sys

    sys.path.insert(0, _here)
    import __spark_entry__ as E

    rnd = _live_round()
    window, _ = rotation_plan.plan(current_round=rnd, slots=50, recert_slots=None, force=[])
    mandatory = {e["name"] for e in window if e["tier"] in ("R", "N")}
    assert mandatory, "planner found no mandatory slots — check _live_round()"
    missing = mandatory - set(E._WINDOW_PRIORITY)
    if missing:
        # expected failure mode at round open, BEFORE the window rotation:
        # the live window is still last round's.  Say so instead of dumping
        # a set diff — the fix is `rotation_plan.py --round {rnd}` copied
        # into _WINDOW_PRIORITY (the round-open workflow step).
        prev, _ = rotation_plan.plan(current_round=rnd - 1, slots=50, recert_slots=None, force=[])
        prev_mandatory = {e["name"] for e in prev if e["tier"] in ("R", "N")}
        if prev_mandatory <= set(E._WINDOW_PRIORITY):
            raise AssertionError(
                f"_WINDOW_PRIORITY is round {rnd - 1}'s window; rotate it: run"
                f" tools/rotation_plan.py --round {rnd} and copy the result in"
                f" (missing mandatory slots: {sorted(missing)[:5]}...)"
            )
        raise AssertionError(
            f"_WINDOW_PRIORITY is missing round-{rnd} mandatory slots: {sorted(missing)}"
        )


def test_projection_reaches_equilibrium_floor():
    """project() (r11, VERDICT r10 item 6): assuming every policy window
    lands green, ID breaches stay 0 every projected round, the
    never-certified backlog is strictly decreasing until empty, and the
    query-age counter never exceeds the documented equilibrium floor
    len(registry) - slots*ceiling once the backlog has emptied."""
    rows = rotation_plan.project(_live_round(), slots=50, horizon=8)
    _, debt = rotation_plan.plan(_live_round(), 50, None, [])
    floor = debt["query_rows_over_ceiling_equilibrium_floor"]
    assert all(r["id_breaches_after_window"] == 0 for r in rows)
    backlog = [r["never_certified_before"] for r in rows]
    assert all(b2 < b1 or b1 == 0 for b1, b2 in zip(backlog, backlog[1:]))
    drained = [r for r in rows if r["never_certified_before"] == 0]
    assert drained, "horizon too short to drain the backlog"
    assert all(r["query_rows_older_than_id_ceiling"] <= floor for r in drained)
