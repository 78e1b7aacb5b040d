"""Driver-window rotation planner (VERDICT r5 items 1 & 7, made reproducible).

The driver certifies the FIRST 50 entries of `__spark_entry__.queries()` each
round, so `_WINDOW_PRIORITY` is the rotation policy. This tool computes the
recommended next window from the hard evidence on disk:

  python tools/rotation_plan.py [--round N] [--slots 50] [--recert-slots 10]

Inputs: CORRECTNESS_r0*.json (driver rows; newest green row per query = its
evidence age) and the registry's per-query SURVEY §2 operator-ID tags.

Policy encoded (the contract the verdicts audit; r8 steady-state policy per
VERDICT r7 item 3):
 1. SAME-ROUND CERTIFICATION for queries added or semantically modified in
    the current round (the no-new-backlog rule) — pass them via --force.
 2. ID-LEVEL EVIDENCE-AGE CEILING: every SURVEY §2 operator ID must have a
    green driver row at most ID_MAX_AGE_ROUNDS (5) rounds old, where an
    ID's evidence age is the NEWEST green row among all queries tagged
    with it.  IDs that would breach by next round get re-cert slots via
    greedy set-cover (each slot re-certifies as many breaching IDs as
    possible, oldest IDs first on ties); the tier is sized by the breach
    list, not a fixed count, so breaches stay at zero.
 3. NEVER-CERTIFIED ID COVERAGE: remaining slots go to queries covering
    §2 IDs with no driver row at all (greedy max-coverage).
 4. BACKLOG FILL: leftover slots burn down never-certified registry
    queries (lowest query number first), then the oldest query-level rows.

Honest-math note (why the ceiling is ID-level and 5 rounds): the registry
holds 423 queries and the window 50 slots, so a query-level ceiling K needs
423 <= 50*K -> K >= 9; a 3-round query-level ceiling can never hold and the
r7 planner's query-level debt report duly showed 130 "breaches" with a
10-slot tier retiring fewer than aged in.  The 213 operator IDs, however,
rotate in ceil(213/~45) < 5 rounds of free slots — and faster via set-cover
since one query row often re-certifies several IDs.  The HARD driver-row
guarantee is therefore per OPERATOR ID (<=5 rounds stale); per-QUERY
freshness for the whole registry comes from the builder-side full vanilla
drive + the pytest oracle suite, which re-hash-check all 423 queries against
DuckDB at the driver's own scale (sf0.01) every round.  The debt report
prints ID-level breaches (must be 0 after each planned window) plus the
query-level age histogram so no verdict discovers drift by archaeology.

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

# Hard ceiling on OPERATOR-ID evidence age (rounds since the newest green
# driver row among queries tagged with the ID) — see the policy note above
# for why 5 is the supportable number and query-level ceilings are not.
ID_MAX_AGE_ROUNDS = 5


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


def plan(
    current_round: int,
    slots: int,
    recert_slots: int | None,
    force: list[str],
    ledger: dict[str, int] | None = None,
):
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    specs = all_queries()
    if ledger is None:
        ledger = load_ledger()

    # ID-level evidence age: newest green row among queries tagged with it
    id_newest: dict[str, int] = {}
    for q, r in ledger.items():
        if q in specs:
            for t in specs[q].tags:
                id_newest[t] = max(r, id_newest.get(t, 0))
    all_ids = {t for s in specs.values() for t in s.tags}
    uncovered = all_ids - set(id_newest)

    # window entries: {"name", "why", "tier" (F/R/N/B), "ids" (the operator
    # IDs this slot re-certifies or first-covers; [] for backlog fills)}
    window: list[dict] = []
    used = set()

    def scheduled_ids() -> set[str]:
        return {t for e in window for t in specs[e["name"]].tags}

    # tier F: forced (new/modified this round)
    for name in force:
        if name not in specs:
            raise KeyError(f"--force {name!r} not in registry")
        window.append({"name": name, "why": "forced: added/modified this round",
                       "tier": "F", "ids": sorted(specs[name].tags)})
        used.add(name)

    # tier R: ID-level age-ceiling re-certification.  An ID breaches at
    # NEXT round if its newest row is older than ID_MAX_AGE_ROUNDS then.
    # Greedy set-cover: each slot re-certifies as many breaching IDs as
    # possible (ties -> the query whose breaching IDs are oldest, then
    # lowest query number).  Sized by the breach list (recert_slots, if
    # given, is only a cap).
    breaching = {
        t for t, r in id_newest.items() if current_round + 1 - r > ID_MAX_AGE_ROUNDS
    } - scheduled_ids()
    n_breach = len(breaching)
    cap = recert_slots if recert_slots is not None else slots
    n_recert = 0
    while breaching and len(window) < slots and n_recert < cap:
        best, gain = None, set()
        for n in specs:
            if n in used:
                continue
            g = set(specs[n].tags) & breaching
            if not g:
                continue
            key = (len(g), -min(id_newest[t] for t in g), -qnum(n))
            if best is None or key > best_key:
                best, gain, best_key = n, g, key
        if best is None:
            break
        oldest = min(id_newest[t] for t in gain)
        window.append(
            {"name": best,
             "why": f"re-cert: {len(gain)} ID(s) w/ newest row <= r{oldest} breach age {ID_MAX_AGE_ROUNDS} at r{current_round + 1}",
             "tier": "R", "ids": sorted(gain)}
        )
        used.add(best)
        breaching -= gain
        n_recert += 1

    # tier N: never-certified IDs, greedy max operator-ID coverage
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
        window.append({"name": best, "why": f"never-certified; covers {sorted(gain)}",
                       "tier": "N", "ids": sorted(gain)})
        used.add(best)
        never.remove(best)
        remaining -= gain

    # tier B: any leftover slots -> never-certified queries lowest-number
    # first (rows-only coverage value), then the oldest query-level rows
    aging_queries = sorted(
        (q for q, r in ledger.items() if q in specs and q not in used),
        key=lambda q: (ledger[q], qnum(q)),
    )
    fillers = sorted(never, key=qnum) + aging_queries
    for name in fillers:
        if len(window) >= slots:
            break
        if name in used:
            continue
        window.append({"name": name,
                       "why": "backlog fill (never-certified, then oldest rows)",
                       "tier": "B", "ids": []})
        used.add(name)

    # post-window ID age histogram: what the ledger will look like if every
    # scheduled row lands green this round
    post_newest = dict(id_newest)
    for t in scheduled_ids():
        post_newest[t] = current_round
    ages = [current_round + 1 - r for r in post_newest.values()]
    debt = {
        "registry": len(specs),
        "driver_certified": len(ledger),
        "never_certified": len([n for n in specs if n not in ledger]),
        # after the window lands green: never-certified entries anywhere in
        # the window (tier B fills AND any set-cover pick that happens to be
        # uncertified) earn their first row
        "never_certified_after_window": len(
            [n for n in specs if n not in ledger and n not in used]
        ),
        "ids_total": len(all_ids),
        "ids_driver_covered": len(id_newest),
        "ids_uncovered_after_window": sorted(remaining),
        "id_breaches_before_window": n_breach,
        "id_breaches_after_window": len(breaching),
        "id_age_histogram_after_window": {
            f"age{a}": ages.count(a) for a in sorted(set(ages))
        },
        "query_rows_older_than_id_ceiling": len(
            [q for q, r in ledger.items() if q in specs and current_round + 1 - r > ID_MAX_AGE_ROUNDS and q not in used]
        ),
        # the counter above CANNOT go below this: with S slots/round and a
        # K-round ceiling only S*K query rows can be fresher than the
        # ceiling at any time, so len(registry) - S*K rows are always over
        # it once every query has a row (the honest-math note, quantified —
        # read the projection against this floor, not against zero)
        "query_rows_over_ceiling_equilibrium_floor": max(
            0, len(specs) - slots * ID_MAX_AGE_ROUNDS
        ),
    }
    return window, debt


def project(current_round: int, slots: int, horizon: int) -> list[dict]:
    """Debt-counter trajectory over the next `horizon` rounds, assuming each
    round runs the policy-computed window and every scheduled row lands
    green (VERDICT r10 item 6: when the never-certified backlog empties,
    tier B flips to oldest query rows — this makes the
    query_rows_older_than_id_ceiling trajectory one planner line instead
    of per-round archaeology).  Expected shape: the counter RISES while
    tier B still burns never-certified backlog (those slots don't refresh
    old rows), then settles at the equilibrium floor
    len(registry) - slots*ID_MAX_AGE_ROUNDS once the backlog is empty
    (r15-r16 at the r11 ledger) — flat-at-floor is the healthy state,
    not a regression."""
    ledger = load_ledger()
    out: list[dict] = []
    for rnd in range(current_round, current_round + horizon):
        window, debt = plan(rnd, slots, None, [], ledger=dict(ledger))
        out.append(
            {
                "round": rnd,
                "never_certified_before": debt["never_certified"],
                "id_breaches_after_window": debt["id_breaches_after_window"],
                "query_rows_older_than_id_ceiling": debt[
                    "query_rows_older_than_id_ceiling"
                ],
            }
        )
        for e in window:  # assume the window lands green
            ledger[e["name"]] = rnd
    return out


_TIER_HEADERS = {
    "F": "# -- Tier F (r{rnd}): forced — queries added/modified this round\n"
         "    # (same-round certification rule). --",
    "R": "# -- Tier R (r{rnd}): ID-level age-ceiling re-certs — {nids} ID(s) whose\n"
         "    # newest row would breach the {ceil}-round ceiling at r{nxt}. --",
    "N": "# -- Tier N (r{rnd}): never-certified operator-ID coverage. --",
    "B": "# -- Tier B (r{rnd}): backlog fill — never-certified registry queries,\n"
         "    # lowest query number first (first-ever driver rows; their IDs are\n"
         "    # all covered by newer sibling rows; burns never-certified\n"
         "    # {nc} -> {nc_after}). --",
}


def emit_window(window: list[dict], debt: dict, current_round: int) -> str:
    """Ready-to-paste `_WINDOW_PRIORITY` block for __spark_entry__.py
    (VERDICT r11 item 6: rotation becomes one copy, not a transcription)."""
    ctx = {
        "rnd": current_round,
        "nxt": current_round + 1,
        "ceil": ID_MAX_AGE_ROUNDS,
        "nids": sum(len(e["ids"]) for e in window if e["tier"] == "R"),
        "nc": debt["never_certified"],
        "nc_after": debt["never_certified_after_window"],
    }
    lines = ["_WINDOW_PRIORITY = ("]
    prev_tier = None
    for e in window:
        if e["tier"] != prev_tier:
            lines.append("    " + _TIER_HEADERS[e["tier"]].format(**ctx))
            prev_tier = e["tier"]
        entry = f'    "{e["name"]}",'
        if e["ids"]:
            entry = f'{entry:45s} # {", ".join(e["ids"])}'
        lines.append(entry)
    lines.append(")")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="the round this window will RUN in")
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument(
        "--recert-slots",
        type=int,
        default=None,
        help="optional CAP on the re-cert tier (default: sized by the ID breach list)",
    )
    ap.add_argument("--force", nargs="*", default=[])
    ap.add_argument(
        "--emit-window",
        action="store_true",
        help="print the ready-to-paste _WINDOW_PRIORITY block for"
        " __spark_entry__.py instead of the numbered plan + debt report",
    )
    ap.add_argument(
        "--project",
        type=int,
        default=4,
        metavar="N",
        help="also print the debt-counter trajectory for the next N rounds"
        " assuming each policy window lands green (0 to disable)",
    )
    args = ap.parse_args()
    window, debt = plan(args.round, args.slots, args.recert_slots, args.force)
    if args.emit_window:
        print(emit_window(window, debt, args.round))
        return
    for i, e in enumerate(window, 1):
        print(f"{i:3d}. {e['name']:40s} # {e['why']}")
    print(json.dumps(debt, indent=1))
    if args.project:
        for row in project(args.round, args.slots, args.project):
            print(
                "projection r{round}: never_certified_before={never_certified_before}"
                " id_breaches_after_window={id_breaches_after_window}"
                " query_rows_older_than_id_ceiling={query_rows_older_than_id_ceiling}".format(**row)
            )


if __name__ == "__main__":
    main()
