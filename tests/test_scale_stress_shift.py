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
# here). Exemptions, each with the reason the rotation is harmless:
# - %97 (BENCH_MOD/EVAL_MOD): the decontamination/eval class rotates
#   per replica (documented in the harness), exactly as it did under
#   the old shift — class DENSITY is preserved on any contiguous range.
# - %8 (PACK_BUCKETS, r11 ADVICE): a uniform sharding bucket, not a
#   planted class — 69,300 % 8 == 4 so replica bucket labels rotate,
#   but every bucket still receives 10× rows total (5·c(b)+5·c(b−4 mod
#   8) with near-uniform c), so per-bucket window work scales linearly.
_RECURRING_MODULI = {3, 5, 7, 9, 10, 11, 20, 50}
_EXEMPT_MODULI = {97, 8}


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


def _plan_module_constants() -> dict[str, int]:
    """Integer UPPER_CASE attributes of every module in the package —
    the lookup table for constant-named moduli."""
    import importlib
    import pkgutil

    import automatic_etl_spark

    consts: dict[str, int] = {}
    for mod_info in pkgutil.walk_packages(
        automatic_etl_spark.__path__, prefix="automatic_etl_spark."
    ):
        if mod_info.name.endswith("__main__"):
            continue  # runs the CLI (sys.exit) at import
        try:
            mod = importlib.import_module(mod_info.name)
        except ImportError:
            continue
        for attr in dir(mod):
            if attr.isupper():
                val = getattr(mod, attr)
                if isinstance(val, int) and not isinstance(val, bool):
                    consts[attr] = val
    return consts


def test_moduli_set_matches_plan_sources():
    """Re-derive the doc_id moduli actually used by the plans; a new
    modulus must be added to _RECURRING_MODULI (and DOC_SHIFT adjusted)
    or explicitly exempted.

    r11 ADVICE fix: the scan covers BOTH syntactic forms (SQL-string
    ``doc_id % 5`` and Column ``F.col("doc_id") % 5``) and BOTH operand
    kinds — literal digits AND constant names (``% {PACK_BUCKETS}`` /
    ``% BENCH_MOD``), resolved against the package's integer constants,
    so a modulus spelled via a named constant can no longer slip past
    the guard."""
    import glob
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "automatic_etl_spark")
    used: set[int] = set()
    names_used: set[str] = set()
    # `doc_id` may be followed by `")` (Column form) before the %.
    digit_re = re.compile(r"doc_id\"?\)?\s*%\s*(\d+)")
    name_re = re.compile(r"doc_id\"?\)?\s*%\s*\{?([A-Z_][A-Z_0-9]*)\}?")
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(f).read()
        used |= {int(m) for m in digit_re.findall(src)}
        names_used |= set(name_re.findall(src))
    consts = _plan_module_constants()
    unresolved = names_used - set(consts)
    assert not unresolved, (
        f"constant-named doc_id moduli {unresolved} not found among the "
        "package's integer constants — extend the lookup or rename"
    )
    used |= {consts[n] for n in names_used}
    # the named forms the package is KNOWN to use must actually be seen,
    # else a regex typo silently voids the guard
    assert {"PACK_BUCKETS", "BENCH_MOD"} <= names_used, (
        f"moduli scan went blind: only matched names {names_used}"
    )
    unexpected = used - _RECURRING_MODULI - _EXEMPT_MODULI
    assert not unexpected, (
        f"new doc_id moduli {unexpected} — DOC_SHIFT must recur them "
        "(or exempt them here with a reason)"
    )
