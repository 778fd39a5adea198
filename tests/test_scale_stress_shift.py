"""Pins for the stress-corpus documents shift (r10 find).

The dedup/curation corpus builders clamp ``doc_id < PLANT_OFFSET``;
through r9 the stress harness shifted document replicas by r*10M —
above the clamp — so every minhash/CC-family "10x" stress row
measured a CONSTANT corpus. These pins make the fix structural: any
future change to DOC_SHIFT / REPLICAS / PLANT_OFFSET that would
silently re-break the scaling property fails here instead of in a
wall-clock record.
"""

from __future__ import annotations

import re

import duckdb

from automatic_etl_spark.plans.dedup_plans import PLANT_OFFSET
from tools.scale_stress import BASE_DIR, DOC_SHIFT, REPLICAS

# Every modulus any plan applies to doc_id (test below re-derives the
# set from source so a new modulus can't be added without landing
# here). %97 is the one deliberate exception: the decontamination
# class rotates per replica (documented in the harness), exactly as
# it did under the old shift.
_RECURRING_MODULI = {3, 5, 7, 9, 10, 11, 20, 50}
_EXEMPT_MODULI = {97}


def _base_max_doc_id() -> int:
    return duckdb.sql(
        f"SELECT max(doc_id) FROM read_parquet('{BASE_DIR}/documents.parquet')"
    ).fetchone()[0]


def test_doc_shift_keeps_replicas_under_the_corpus_clamp():
    assert DOC_SHIFT * (REPLICAS - 1) + _base_max_doc_id() < PLANT_OFFSET, (
        "replica doc_ids would cross PLANT_OFFSET — the clamped corpora "
        "would stop scaling (the exact r10 bug)"
    )


def test_doc_shift_keeps_replica_ids_disjoint():
    assert DOC_SHIFT > _base_max_doc_id(), (
        "replica id ranges overlap — dup groups would merge across replicas"
    )


def test_doc_shift_recurs_every_planted_class():
    for m in _RECURRING_MODULI | {100}:  # 100: the vec_id query-set class
        assert DOC_SHIFT % m == 0, f"doc_id %% {m} classes rotate per replica"


def test_moduli_set_matches_plan_sources():
    """Re-derive the doc_id moduli actually used by the plans; a new
    modulus must be added to _RECURRING_MODULI (and DOC_SHIFT adjusted)
    or explicitly exempted."""
    import glob
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "automatic_etl_spark")
    used: set[int] = set()
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        used |= {
            int(m) for m in re.findall(r"doc_id\s*%\s*(\d+)", open(f).read())
        }
    unexpected = used - _RECURRING_MODULI - _EXEMPT_MODULI
    assert not unexpected, (
        f"new doc_id moduli {unexpected} — DOC_SHIFT must recur them "
        "(or exempt them here with a reason)"
    )
