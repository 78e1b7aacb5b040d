"""Driver-window rotation planner (VERDICT r5 items 1 & 7, made reproducible).

The driver certifies the FIRST 50 entries of `__spark_entry__.queries()` each
round, so `_WINDOW_PRIORITY` is the rotation policy. This tool computes the
recommended next window from the hard evidence on disk:

  python tools/rotation_plan.py [--round N] [--slots 50] [--recert-slots 10]

Inputs: CORRECTNESS_r0*.json (driver rows; newest green row per query = its
evidence age) and the registry's per-query SURVEY §2 operator-ID tags.

Policy encoded (the contract the verdicts audit):
 1. NEVER-CERTIFIED FIRST, by operator-ID coverage: greedy max-coverage so
    each slot certifies as many driver-uncovered §2 IDs as possible.
 2. EVIDENCE-AGE CEILING: no green row older than MAX_AGE_ROUNDS (3). Queries
    whose newest row would exceed it by next round get re-cert slots
    (default 10/round, oldest first; overflow is reported, not hidden).
 3. SAME-ROUND CERTIFICATION for queries added or semantically modified in
    the current round (the no-new-backlog rule) — pass them via --force.

Honest-math note: with a 410-query registry and a 50-slot window, a <=3-round
age ceiling cannot hold for EVERY query — a full rotation takes ceil(410/50)
= 9 rounds. The ceiling therefore governs the RE-CERT TIER's priority order
(oldest rows first, 10 slots/round), while per-round freshness for the whole
registry comes from the builder-side full vanilla drive + the pytest oracle
suite, which re-hash-check all queries at the driver's own scale every round.
The debt report prints how many rows breach the ceiling so no verdict has to
discover it by archaeology.

Output: the ordered window (with per-slot rationale) + a debt report:
remaining driver-uncovered IDs, queries at/over the age ceiling, and how many
rounds of window budget the backlog represents.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_AGE_ROUNDS = 3


def load_ledger() -> dict[str, int]:
    """query -> newest round with a green driver row."""
    ledger: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)\.json$", f).group(1))
        for q, v in json.load(open(f)).items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and (v.get("hash_match") in (True, None))
                and not v.get("err")
            )
            if ok:
                ledger[q] = max(rnd, ledger.get(q, 0))
    return ledger


def qnum(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


def plan(current_round: int, slots: int, recert_slots: int, force: list[str]):
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    specs = all_queries()
    ledger = load_ledger()

    covered_ids = set()
    for q in ledger:
        if q in specs:
            covered_ids |= set(specs[q].tags)
    all_ids = {t for s in specs.values() for t in s.tags}
    uncovered = all_ids - covered_ids

    window: list[tuple[str, str]] = []  # (name, rationale)
    used = set()

    # tier F: forced (new/modified this round)
    for name in force:
        if name not in specs:
            raise KeyError(f"--force {name!r} not in registry")
        window.append((name, "forced: added/modified this round"))
        used.add(name)

    # tier R: evidence-age re-certification (rows that would breach the
    # ceiling by NEXT round go first)
    aging = sorted(
        (q for q, r in ledger.items() if q in specs and current_round + 1 - r > MAX_AGE_ROUNDS),
        key=lambda q: (ledger[q], qnum(q)),
    )
    for name in aging[:recert_slots]:
        if len(window) >= slots:
            break
        if name in used:
            continue
        window.append((name, f"re-cert: newest row r{ledger[name]} breaches age {MAX_AGE_ROUNDS} at r{current_round + 1}"))
        used.add(name)
    aging_overflow = [q for q in aging[recert_slots:] if q not in used]

    # tier N: never-certified, greedy max operator-ID coverage
    remaining = set(uncovered)
    never = [n for n in specs if n not in ledger and n not in used]
    while len(window) < slots:
        best, gain = None, set()
        for n in never:
            g = set(specs[n].tags) & remaining
            if (len(g), -qnum(n)) > (len(gain), -qnum(best) if best else -(10**9)):
                best, gain = n, g
        if best is None or not gain:
            break
        window.append((best, f"never-certified; covers {sorted(gain)}"))
        used.add(best)
        never.remove(best)
        remaining -= gain

    # tier B: any leftover slots -> oldest never-certified queries (rows-only
    # coverage value), then oldest aging overflow
    fillers = sorted(never, key=qnum) + aging_overflow
    for name in fillers:
        if len(window) >= slots:
            break
        if name in used:
            continue
        window.append((name, "backlog fill (never-certified / aging overflow)"))
        used.add(name)

    debt = {
        "registry": len(specs),
        "driver_certified": len(ledger),
        "never_certified": len([n for n in specs if n not in ledger]),
        "ids_total": len(all_ids),
        "ids_driver_covered": len(covered_ids),
        "ids_uncovered_after_window": sorted(remaining),
        "age_ceiling_breaches_next_round": len(aging),
        "aging_not_scheduled": aging_overflow,
    }
    return window, debt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="the round this window will RUN in")
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--recert-slots", type=int, default=10)
    ap.add_argument("--force", nargs="*", default=[])
    args = ap.parse_args()
    window, debt = plan(args.round, args.slots, args.recert_slots, args.force)
    for i, (name, why) in enumerate(window, 1):
        print(f"{i:3d}. {name:40s} # {why}")
    print(json.dumps(debt, indent=1))


if __name__ == "__main__":
    main()
