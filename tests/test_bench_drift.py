"""Cross-round bench drift gate (VERDICT r7 #5).

BENCH_r05/r06 lost their per-query maps to stdout truncation; since
r7, every `bench.py` run writes the full map to
``logs/bench_detail.json`` (untracked). The previous round's detail is
now COMMITTED under ``bench_baselines/``, and this gate compares the
most recent local run against it: any query slower by more than 2×
the recorded sample-pair noise band is flagged.

Methodology (matches COVERAGE.md "Bench drift check"): bench measures
best-of-2 per query and records both samples in ``runs``. On this VM,
identical idle-machine runs scatter multi-x on multi-job iterative
queries (near_dup_canonical 10-30 s documented), so the band is the
LARGER of the two runs' own sample spreads — a query is only flagged
when its slowdown exceeds twice what its own samples say is noise,
AND the absolute delta is > 0.75 s (sub-second queries scatter ±2×
in both directions; that floor is the documented noise regime, not
drift).

The gate SKIPS when there is no fresh local detail file — it guards
rounds where bench actually ran, it does not run bench itself.

CROSS-ROUND comparisons (r12, VERDICT r11 #3): this gate is LOCAL —
same host regime, fresh baseline each round. For round-over-round
perf questions, do NOT compare in-bench driver totals (they drifted
189 → 210 → 215 s across r9–r11 on fingerprint-identical plans, all
host-regime noise); compare the load-controlled fresh-JVM minima in
``bench_baselines/headliner_minima_r{N}.json`` (written once per
round by ``tools/headliner_minima.py``, loadavg recorded per sample).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CURRENT = os.path.join(REPO, "logs", "bench_detail.json")

ABS_FLOOR_SEC = 0.75


def _spread(pair: list[float]) -> float:
    lo, hi = min(pair), max(pair)
    return hi / lo if lo > 0 else 1.0


def _latest_baseline() -> str:
    """Newest committed baseline by PARSED round number, resolved at
    test time (r8 advice: module-import glob()[-1] turned an empty
    bench_baselines/ into a collection-time IndexError, and relied on
    lexicographic filename order instead of the round number)."""
    paths = glob.glob(
        os.path.join(REPO, "bench_baselines", "bench_detail_*.json")
    )
    if not paths:
        pytest.fail(
            "bench_baselines/ has no bench_detail_*.json — the drift "
            "gate has nothing to compare against; commit the previous "
            "round's detail file"
        )

    def _round_no(p: str) -> int:
        m = re.search(r"bench_detail_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return max(paths, key=_round_no)


def test_latest_baseline_recorded_near_idle():
    """r10 verdict: a baseline captured under ambient load silently
    absorbs real regressions (the r10 file summed 203.9 s at loadavg
    ~6-8). bench.py records loadavg_start since r11; the committed
    baseline the gate compares against must prove it started near-idle
    so the gate's noise band means what it says. (Baselines predating
    the field are never latest once an r11+ file exists.)"""
    with open(_latest_baseline()) as fh:
        base = json.load(fh)
    start = base.get("loadavg_start")
    assert start is not None, (
        "committed baseline lacks loadavg_start — regenerate it with "
        "the current bench.py so its idleness is auditable"
    )
    assert start[0] < 2.0, (
        f"committed baseline started at 1-min loadavg {start[0]:.2f} — "
        "not idle; re-record on a quiet machine (the r10 inflated-"
        "baseline class)"
    )


def test_bench_drift_vs_committed_baseline():
    BASELINE = _latest_baseline()
    if not os.path.exists(CURRENT):
        pytest.skip("no local bench run (logs/bench_detail.json absent)")
    if os.path.getmtime(CURRENT) < os.path.getmtime(BASELINE):
        # the local detail predates the committed baseline (e.g. a
        # stale file from a previous round after the baseline was
        # deliberately regenerated) — it vouches for nothing
        pytest.skip("local bench detail is older than the baseline")
    with open(BASELINE) as fh:
        base = json.load(fh)
    with open(CURRENT) as fh:
        cur = json.load(fh)

    flagged = []
    common = set(base["queries"]) & set(cur["queries"])
    assert len(common) >= 100, (
        f"only {len(common)} common queries vs baseline — the headliner "
        "set shrank; regenerate the baseline deliberately"
    )
    for q in sorted(common):
        b, c = base["queries"][q], cur["queries"][q]
        if c <= b or (c - b) < ABS_FLOOR_SEC:
            continue
        band = max(
            _spread(base["runs"].get(q, [b])),
            _spread(cur["runs"].get(q, [c])),
            1.0,
        )
        if c / b > 2.0 * band:
            flagged.append(
                f"{q}: {b:.2f}s -> {c:.2f}s ({c / b:.1f}x, "
                f"noise band {band:.1f}x)"
            )
    assert not flagged, (
        "bench drift beyond 2x the sample-pair noise band vs "
        f"{os.path.basename(BASELINE)}:\n  "
        + "\n  ".join(flagged)
        + "\nIf the slowdown is a deliberate plan change, regenerate "
        "the baseline in the same commit."
    )
