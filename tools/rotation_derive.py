#!/usr/bin/env python
"""Derive the expected `_CHECK_PRIORITY` rotation from the on-disk
CORRECTNESS_r*.json ledger and diff it against `__spark_entry__.py`.

The rotation policy (steady state since r8, judge-verified every
round): the driver's correctness harness hard-checks the first 50
`queries()` entries, so slots 1-50 must carry the queries whose green
driver signal is OLDEST. Policy, mechanically:

1. For every registry query, find the LATEST round with a green row
   in CORRECTNESS_r{N}.json (rows_match + schema_match + no err).
2. Sort: older latest-round first, alphabetical within a round.
3. The first 50 are the CURRENT window; the next 53 pre-stage the
   following round (50 land, the alphabetical tail spills onward).

Run at round start (after the driver commits the previous round's
CORRECTNESS file) to print the window the new round must land; run
after editing `__spark_entry__.py` to verify the edit. Exit 0 = the
committed `_CHECK_PRIORITY` matches the derivation exactly; 1 = any
drift (printed).

Usage:
    python tools/rotation_derive.py            # diff against file
    python tools/rotation_derive.py --print    # just print cohorts
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50          # driver hard-check width (observed r1..r12)
PRESTAGE_SPILL = 3   # cohorts are 50 wide, so 53 names pre-stage


def ledger_paths() -> list[str]:
    """CORRECTNESS files present on disk, oldest round first.

    Presence-on-disk (not git tracking) is deliberately the contract
    (r13 ADVICE asked for this to be stated): at round start the
    driver's freshly written CORRECTNESS_r{N}.json is often still
    untracked, and it MUST enter the derivation — landing the window
    it implies IS the round's rotation task. Filtering through
    `git ls-files` would silently derive the stale window in exactly
    that state. Consequence: a scratch CORRECTNESS_r*.json parked in
    the repo root also enters; don't put scratch ledgers there
    (tests/test_rotation_pin.py fails loudly on most stray shapes).
    """
    return sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )


def latest_green(paths=None) -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in (ledger_paths() if paths is None else paths):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, rec in json.load(open(path)).items():
            if (rec.get("err") is None and rec.get("rows_match")
                    and rec.get("schema_match")):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def derive(registry_names=None, paths=None) -> tuple[list[str], dict[int, list[str]]]:
    """Derived check order, oldest green signal first.

    A registry query with NO green row in any ledger file has never
    produced a driver signal at all — by the staleness policy that is
    the OLDEST possible state, so such names sort to the very front
    (cohort 0) instead of silently dropping out of the rotation
    (r12 ADVICE). Callers that know the registry pass its names;
    without them the ledger is assumed closed.
    """
    latest = latest_green(paths)
    cohorts: dict[int, list[str]] = defaultdict(list)
    for name, rnd in latest.items():
        cohorts[rnd].append(name)
    if registry_names is not None:
        never_green = sorted(set(registry_names) - set(latest))
        if never_green:
            print(f"WARNING: {len(never_green)} registry queries have "
                  f"no green ledger row (fronted): {never_green}")
            cohorts[0] = never_green
    order: list[str] = []
    for rnd in sorted(cohorts):
        order.extend(sorted(cohorts[rnd]))
    return order, cohorts


def drift_report(actual: list[str], expected: list[str]) -> list[str]:
    """Slot-level drift lines between the file's `_CHECK_PRIORITY` and
    the derivation. Uses zip_longest so length divergence prints the
    extra/missing tail names explicitly (as ``<absent>`` pairs) instead
    of truncating at the shorter list (r12 ADVICE); factored out of
    main() so the suite can drive the REAL reporting path
    (tests/test_rotation_pin.py, r13 ADVICE)."""
    from itertools import zip_longest

    _ABSENT = "<absent>"
    lines: list[str] = []
    if actual[:WINDOW] != expected[:WINDOW]:
        lines.append("WINDOW DRIFT (slots 1-50):")
        for i, (a, x) in enumerate(zip_longest(
                actual[:WINDOW], expected[:WINDOW], fillvalue=_ABSENT)):
            if a != x:
                lines.append(f"  slot {i + 1}: file={a!r} expected={x!r}")
    if actual[WINDOW:] != expected[WINDOW:]:
        lines.append("PRE-STAGE DRIFT (slots 51+): file has "
                     f"{len(actual) - WINDOW}, derivation expects "
                     f"{len(expected) - WINDOW}")
        for i, (a, x) in enumerate(zip_longest(
                actual[WINDOW:], expected[WINDOW:], fillvalue=_ABSENT)):
            if a != x:
                lines.append(
                    f"  slot {WINDOW + i + 1}: file={a!r} expected={x!r}")
    return lines


def main() -> int:
    from automatic_etl_spark.plans.all_plans import REGISTRY

    order, cohorts = derive(list(REGISTRY))
    if "--print" in sys.argv:
        for rnd in sorted(cohorts):
            print(f"r{rnd}-latest: {len(cohorts[rnd])}")
        print("\nwindow (slots 1-50):")
        print("\n".join(order[:WINDOW]))
        print("\npre-stage (next round's 53):")
        print("\n".join(order[WINDOW:WINDOW + WINDOW + PRESTAGE_SPILL]))
        return 0

    import __spark_entry__ as e

    missing = [n for n in order if n not in REGISTRY]
    if missing:
        print(f"ledger names not in REGISTRY: {missing}")
        return 1
    expected = order[:WINDOW + WINDOW + PRESTAGE_SPILL]
    actual = list(e._CHECK_PRIORITY)
    if actual == expected:
        ledger = len(latest_green())
        print(f"rotation OK: window + pre-stage match the derivation "
              f"({len(actual)} names; ledger covers {ledger}/"
              f"{len(REGISTRY)} registry queries)")
        return 0
    print("\n".join(drift_report(actual, expected)))
    print("\nNOTE: drift at round START (before the rotation lands) is "
          "the expected state when the driver has just committed a new "
          "CORRECTNESS file — landing the printed window IS the "
          "round's rotation task. Drift after landing is a bug.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
