#!/usr/bin/env python
"""Per-round fresh-JVM-minima table for the driver-bench headliners
(VERDICT r11 #3).

The driver-bench TOTAL drifted 189 s (r9) -> 210 s (r10) -> 215 s
(r11) on fingerprint-identical plans — all host-regime noise — so
round-over-round comparisons of the in-bench numbers degraded into
regime archaeology (the r10 and r11 rounds each spent a verdict item
re-litigating ambient load). This tool records, once per round, a
LOAD-CONTROLLED column: the minimum over N fresh-JVM samples per
headliner at sf0.1, with the 1-min loadavg captured before every
sample so idleness is auditable from the artifact alone. Cross-round
perf questions should compare THESE minima (same methodology as the
r10/r11 pagerank and python_stream isolations, tools/scale_stress.py
--child), not the in-bench driver numbers.

Usage:
    python tools/headliner_minima.py --round 12 [--samples 4] [names...]

Default headliner set (retention policy, r13 verdict): the UNION of
the top-10s of the last 3 BENCH_r*.json files' ``parsed.queries``
(the driver records exactly its 10 slowest per round). A query stays
in the column while it appears in ANY of those three top-10s and is
archived once it rotates out of all of them — its history stays in
the older headliner_minima_r*.json files — so the column stops
growing monotonically under the old newest-top-10 ∪ previous-names
union rule. Writes bench_baselines/headliner_minima_r{N}.json.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
CHILD = os.path.join(REPO, "tools", "scale_stress.py")


RETENTION_ROUNDS = 3  # keep a query while in any of the last N top-10s


def _bench_top10(path: str) -> list[str]:
    rec = json.load(open(path))
    # "parsed" can be explicitly null in early BENCH files (failed
    # driver parse), not just absent — guard both shapes
    queries = (rec.get("parsed") or {}).get("queries") or rec.get("queries")
    if not isinstance(queries, dict) or not queries:
        sys.exit(f"{path} has no parsed.queries/queries map (failed "
                 "driver run?) — pass query names explicitly")
    return sorted(queries, key=lambda n: -queries[n])[:10]


def retention_headliners() -> tuple[list[int], list[str]]:
    """Minima set under the retention policy (r13 verdict): union of
    the top-10s of the last RETENTION_ROUNDS BENCH files. Returns
    (bench rounds used, sorted names)."""
    by_round: dict[int, str] = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        # one file per ROUND: prefer the round's main record over
        # auxiliary captures like BENCH_r14_c8.json (r15 fix — the
        # plain last-3-files glob counted the c8 aux file as a round
        # and silently dropped the oldest real round from retention)
        if rnd not in by_round or len(os.path.basename(p)) < len(
            os.path.basename(by_round[rnd])
        ):
            by_round[rnd] = p
    if not by_round:
        sys.exit("no BENCH_r*.json in the repo — pass query names "
                 "explicitly")
    used = [by_round[r] for r in sorted(by_round)][-RETENTION_ROUNDS:]
    names: set[str] = set()
    for p in used:
        names.update(_bench_top10(p))
    rounds = [int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
              for p in used]
    return rounds, sorted(names)


def one_sample(
    name: str, idle_below: float = 0.0
) -> tuple[float | None, float, str | None]:
    """One fresh-JVM measurement (warm on sf0.001, time sf0.1);
    returns (sec|None, loadavg_1min_before, gate_violation|None).

    ``idle_below`` > 0 sleeps (up to 4 min) until the 1-min loadavg
    decays under the threshold before launching the child. Without it,
    back-to-back serial children leave the PREVIOUS child's load in
    the 1-min average (no actual contention — the child exited — but
    the recorded "before" value stops proving idleness, the exact
    property this artifact exists to carry).

    If the sample still launches above threshold, it runs anyway (load
    bias only inflates minima, never fakes a fast run) but the third
    return value names the cause so the artifact records the
    violated-gate sample explicitly instead of silently (r12 ADVICE):
    ``"timed_out"`` when the 240 s budget was exhausted still above
    threshold, ``"launched_above_threshold"`` when the wait loop exited
    early (load dipped under) but load bounced back above before launch
    (r13 ADVICE — previously mislabeled as a timeout)."""
    from tools.scale_stress import run_child

    gate_violation = None
    if idle_below > 0:
        waited = 0.0
        while os.getloadavg()[0] >= idle_below and waited < 240:
            import time
            time.sleep(10)
            waited += 10
        if os.getloadavg()[0] >= idle_below:
            gate_violation = (
                "timed_out" if waited >= 240 else "launched_above_threshold")
            cause = (
                f"idle gate TIMED OUT after {waited:.0f}s"
                if gate_violation == "timed_out"
                else f"idle gate decayed then bounced back above "
                     f"threshold before launch (waited {waited:.0f}s)")
            sys.stderr.write(
                f"{name}: {cause} "
                f"(loadavg1={os.getloadavg()[0]:.2f} >= {idle_below}); "
                "sampling anyway — flagged in artifact\n")
    load1 = os.getloadavg()[0]
    sec, err = run_child(name, SF_DIR, timeout=1800)
    if err is not None:
        sys.stderr.write(f"{name}: child failed: {err}\n")
    return sec, round(load1, 2), gate_violation


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--idle-below", type=float, default=0.0,
                    help="wait (≤4 min) for 1-min loadavg under this "
                         "value before each sample")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.names:
        names = args.names
        source = f"explicit CLI names ({len(names)})"
    else:
        bench_rounds, names = retention_headliners()
        source = (f"retention policy: union of BENCH top-10s of rounds "
                  f"{bench_rounds} ({len(names)} names)")

    out: dict = {
        "_meta": {
            "round": args.round,
            "date": datetime.date.today().isoformat(),
            "harness": (
                "tools/headliner_minima.py — fresh JVM per sample via "
                "tools/scale_stress.py --child (warmed on sf0.001, "
                "timed on sf0.1), min over samples reported"
            ),
            "headliner_source": source,
            "retention_policy": (
                f"r13-verdict retention: a query stays in this column "
                f"while it appears in ANY of the last {RETENTION_ROUNDS} "
                "rounds' BENCH top-10s and is archived once it rotates "
                "out of all of them (history remains in older "
                "headliner_minima_r*.json files) — bounds the column "
                "that the old newest-top-10 ∪ previous-names union rule "
                "grew monotonically"
            ),
            "samples_per_query": args.samples,
            "idle_below": args.idle_below,
            "purpose": (
                "load-controlled cross-round perf column (VERDICT r11 "
                "#3): compare these minima across rounds, not the "
                "in-bench driver totals, which carry host-regime drift"
            ),
        },
    }
    dst = os.path.join(
        REPO, "bench_baselines", f"headliner_minima_r{args.round:02d}.json"
    )
    for name in names:
        samples: list[float] = []
        loads: list[float] = []
        gate_violations: list[str | None] = []
        for _ in range(args.samples):
            sec, load1, violation = one_sample(
                name, idle_below=args.idle_below)
            if sec is not None:
                samples.append(sec)
            loads.append(load1)
            gate_violations.append(violation)
        row = {
            "min": min(samples) if samples else None,
            "samples": samples,
            "loadavg1_before_each": loads,
        }
        # only materialize the flag when a gate was actually violated,
        # so the common all-idle artifact stays visibly clean (r12
        # ADVICE); values name the cause — "timed_out" vs
        # "launched_above_threshold" (r13 ADVICE)
        if any(gate_violations):
            row["gate_violation_per_sample"] = gate_violations
        out[name] = row
        print(f"{name}: {row}", file=sys.stderr)
        # flush after every query: a wedged/killed child (run_child
        # returns None on timeout, but the process itself can die too)
        # must not discard the completed rows of a ~1 h collection
        with open(dst, "w") as f:
            json.dump(out, f, indent=1)

    print(dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
