"""Compute registry-evidence tiers from the driver's CORRECTNESS_r*.json
files and emit the recommended next-round window order.

The external driver verifies only a PREFIX WINDOW of kgx.queries.REGISTRY
(50 rows per round) against the DuckDB oracle. With a registry larger than
the window, which rows regain fresh driver evidence is decided entirely by
registry ORDER — so the order is a correctness-evidence policy. Round 4
maintained that policy as a hand-ordered comment; this script makes it
COMPUTED (VERDICT r4 #1):

  tier 1: rows whose latest driver-green round is the STALEST (re-verify
          first — these are the rows whose evidence would otherwise age
          past the bounded-staleness invariant),
  tier 2: rows named on the command line as new/changed this round (their
          code or oracle SQL changed, so prior evidence is void),
  tier 3: everything else, oldest evidence first, current registry order
          as the deterministic tie-breaker.

Usage:
  python scripts/registry_window.py [--window 50] [changed_row ...]

Prints one row per line: `<tier> <latest_green_round> <name>`, the first
--window of which is the recommended prefix, then a summary asserting the
bounded-staleness invariant the test suite pins (tests/test_round5.py):
after the coming round's check, no registry row's latest driver-green
evidence may be older than 2 rounds.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def row_green(row: dict) -> bool:
    """A driver CORRECTNESS row counts as green iff rows+schema matched,
    the value hash matched where the driver computed one (hash_match may
    be absent for rows-only checks of non-SQL-expressible ops), and no
    error was recorded."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def latest_green_rounds() -> tuple[dict[str, int], int]:
    """(name -> latest driver-green round, current round = max seen + 1)."""
    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
            else:
                latest.setdefault(name, 0)
    return latest, (max(rounds) + 1 if rounds else 1)


def window_order(
    registry_names: list[str],
    changed: list[str],
    latest: dict[str, int],
    current: int,
) -> list[tuple[int, int, str]]:
    """Full-registry (tier, latest_green, name) order per the policy.

    tier 1: rows the invariant FORCES into the window — driver evidence
            that would age past current-2 if skipped (0 < lg <
            current-2), plus checked-but-never-green rows (red rows
            must be re-verified, not buried);
    tier 2: rows with prior evidence voided or absent — named as
            changed on the command line, or never driver-checked at
            all (new this round);
    tier 3: everything else (fresh-enough evidence), stalest first.

    (The pre-round-5-close formula derived tier 1 from `lg <= min(lg)`;
    once never-checked rows exist that min is 0 and the aging rows the
    invariant actually protects fell to tier 3 — exposed when the
    round-5 registry outgrew exactly 50 tier-leading rows.)"""
    pos = {n: i for i, n in enumerate(registry_names)}
    rows = []
    for n in registry_names:
        lg = latest.get(n, 0)
        if (0 < lg < current - 2) or (lg == 0 and n in latest):
            tier = 1
        elif n in changed or n not in latest:
            tier = 2
        else:
            tier = 3
        rows.append((tier, lg, n))
    # tier asc; within a tier stalest evidence first (never-checked
    # lg=0 rows of tier 2 lead it — they have no evidence at all);
    # registry order breaks ties
    rows.sort(key=lambda t: (t[0], t[1], pos[t[2]]))
    return rows


def main() -> None:
    args = sys.argv[1:]
    window = 50
    if args and args[0] == "--window":
        window = int(args[1])
        args = args[2:]
    changed = list(args)

    sys.path.insert(0, REPO)
    from kgx.queries import REGISTRY

    names = list(REGISTRY)
    latest, current = latest_green_rounds()
    rows = window_order(names, changed, latest, current)

    for i, (tier, lg, n) in enumerate(rows):
        marker = "|<-- window edge" if i == window - 1 else ""
        print(f"{tier} r{lg or '-'} {n} {marker}")

    in_window = {n for _, _, n in rows[:window]}
    # the invariant covers rows with driver evidence that can age out;
    # never-checked rows (lg == 0 and absent from every CORRECTNESS
    # file) have nothing to expire — same semantics as the test suite's
    # test_registry_bounded_staleness_invariant (0 < latest < current-2)
    stale_after = [
        n for _, lg, n in rows
        if n not in in_window and 0 < lg < current - 2
    ]
    print(f"\nregistry={len(names)} window={window} current_round=r{current}")
    # checked-but-never-green is a red row, not a staleness question —
    # fail loudly (mirrors the test's never_green assertion)
    never_green = [n for n in names if latest.get(n) == 0 and n in latest]
    if never_green:
        print(f"RED ROWS — checked but never driver-green: {never_green}")
        sys.exit(1)
    if stale_after:
        print(
            "INVARIANT VIOLATED — rows outside the window whose evidence "
            f"would age past {current - 2}: {stale_after}"
        )
        sys.exit(1)
    print(
        "bounded-staleness invariant holds: every row outside the window "
        f"has driver-green evidence from r{current - 2} or newer"
    )


if __name__ == "__main__":
    main()
