"""Pin `_CHECK_PRIORITY` to the rotation_derive derivation (r12 verdict).

`tools/rotation_derive.py` is the mechanical source of truth for the
correctness-window rotation, but until this test it was advisory — the
suite never failed on drift. There are exactly TWO legitimate states
for `__spark_entry__.py`:

1. post-landing (normal): `_CHECK_PRIORITY` equals the derivation over
   ALL committed CORRECTNESS_r*.json files;
2. round-start (transient): the driver has just committed a new
   CORRECTNESS file but the builder has not yet landed the rotation —
   `_CHECK_PRIORITY` equals the derivation over all files EXCEPT the
   newest one.

Any other content is drift (typo'd hand-edit, stale window after a
landing, a ledger rewrite) and fails loudly here.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from rotation_derive import (  # noqa: E402
    PRESTAGE_SPILL,
    WINDOW,
    derive,
    ledger_paths,
    latest_green,
)

import __spark_entry__ as entry_mod  # noqa: E402
from automatic_etl_spark.plans.all_plans import REGISTRY  # noqa: E402

N = WINDOW + WINDOW + PRESTAGE_SPILL  # 103 committed slots


def _expected(paths):
    order, _ = derive(list(REGISTRY), paths=paths)
    return order[:N]


def test_check_priority_matches_a_legitimate_derivation():
    paths = ledger_paths()
    assert paths, "no committed CORRECTNESS_r*.json ledger files"
    actual = list(entry_mod._CHECK_PRIORITY)
    post_landing = _expected(paths)
    if actual == post_landing:
        return  # normal steady state
    round_start = _expected(paths[:-1])
    assert actual == round_start, (
        "_CHECK_PRIORITY matches NEITHER the post-landing derivation "
        "(all ledger files) nor the round-start derivation (all but "
        f"newest, {os.path.basename(paths[-1])}) — rotation drift.\n"
        "Run `python tools/rotation_derive.py` for the slot-level diff."
    )


def test_ledger_is_closed_over_the_registry():
    """Every registry query has a green driver row somewhere (r8+)."""
    never_green = sorted(set(REGISTRY) - set(latest_green()))
    assert not never_green, (
        f"{len(never_green)} registry queries have never gone green in "
        f"the committed ledger: {never_green} — rotation_derive fronts "
        "them (cohort 0), so land them in the next window."
    )


def test_window_width_matches_driver_contract():
    """The driver hard-checks the first 50 queries() entries."""
    assert WINDOW == 50
    assert len(entry_mod._CHECK_PRIORITY) == N
    # _CHECK_PRIORITY must be a prefix of queries() order
    names = list(entry_mod.queries())
    assert names[:N] == list(entry_mod._CHECK_PRIORITY)


def test_never_green_names_are_fronted():
    """r12 ADVICE: a registry name absent from the ledger must sort to
    the FRONT of the derived order, not silently vanish from it."""
    order, cohorts = derive(list(REGISTRY) + ["__phantom_query__"])
    assert order[0] == "__phantom_query__"
    assert cohorts[0] == ["__phantom_query__"]


def test_drift_reporting_covers_length_divergence():
    """r12 ADVICE, made real per r13 ADVICE: drive rotation_derive's
    ACTUAL reporting path (`drift_report`) on length-divergent windows
    and assert the extra/missing tail names surface as ``<absent>``
    pairs. A regression to plain zip() — which silently truncates at
    the shorter list — fails here."""
    from rotation_derive import drift_report

    base = [f"q{i:03d}" for i in range(WINDOW)]

    # file has an extra pre-stage tail name the derivation lacks
    text = "\n".join(drift_report(base + ["extra_file_tail"], base))
    assert "PRE-STAGE DRIFT" in text
    assert f"slot {WINDOW + 1}: file='extra_file_tail' " \
           "expected='<absent>'" in text

    # derivation expects a tail name the file lacks
    text = "\n".join(drift_report(base, base + ["missing_expected_tail"]))
    assert f"slot {WINDOW + 1}: file='<absent>' " \
           "expected='missing_expected_tail'" in text

    # window-side length divergence prints too (file shorter than 50)
    text = "\n".join(drift_report(base[:-1], base))
    assert "WINDOW DRIFT" in text
    assert f"slot {WINDOW}: file='<absent>' " \
           f"expected={base[-1]!r}" in text

    # and identical lists report nothing
    assert drift_report(list(base), list(base)) == []


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
