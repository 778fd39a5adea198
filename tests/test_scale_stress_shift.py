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
from tools.scale_stress import (
    BASE_DIR,
    CUSTKEY_SHIFT,
    DOC_SHIFT,
    EVENT_USER_SHIFT,
    ORDERKEY_SHIFT,
    REPLICAS,
    SHIFT,
)

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


def test_staged_stress_corpus_matches_current_shifts():
    """r12 ADVICE #4 made the harness staleness probe exact on EVERY
    replicated key column; this pin re-derives the same expectation
    independently so a probe bug can't pass its own staged file.
    Skips when the stress corpus isn't staged (it lives in /tmp)."""
    import os

    import pytest

    from tools.scale_stress import STRESS_DIR

    if not os.path.isdir(STRESS_DIR):
        pytest.skip("stress corpus not staged")
    per_table = {
        "documents": {"doc_id": DOC_SHIFT},
        "embeddings": {"vec_id": SHIFT},
        "events": {"event_id": SHIFT, "user_id": EVENT_USER_SHIFT},
        "orders": {"o_orderkey": ORDERKEY_SHIFT,
                   "o_custkey": CUSTKEY_SHIFT},
        "customer": {"c_custkey": CUSTKEY_SHIFT},
        "lineitem": {"l_orderkey": ORDERKEY_SHIFT},
    }
    # Check every PRESENT staged table (r12 review find: a mid-loop
    # skip on one missing table would discard the checks of tables
    # later in the dict — a partially staged dir must still have its
    # present files validated, since build_stress_dir only rebuilds
    # what its own probe flags).
    for table, shifts in per_table.items():
        staged = os.path.join(STRESS_DIR, f"{table}.parquet")
        if not os.path.exists(staged):
            continue
        for col, shift in shifts.items():
            base_max, = duckdb.sql(
                f"SELECT max({col}) FROM "
                f"read_parquet('{BASE_DIR}/{table}.parquet')"
            ).fetchone()
            staged_max, = duckdb.sql(
                f"SELECT max({col}) FROM read_parquet('{staged}')"
            ).fetchone()
            assert staged_max == base_max + (REPLICAS - 1) * shift, (
                f"{table}.{col}: staged corpus was built with a "
                f"different shift than the current constant {shift} — "
                "the silent-constant-corpus class (rebuild via "
                "tools/scale_stress.py --build)"
            )


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


# --- r11 generalization: the same guard for EVERY replicated key ---
#
# The r10 bug class was a shift that silently broke a key-class
# assumption (doc_id replicas crossing the PLANT_OFFSET clamp). The
# doc_id pins above close that column; these pins extend the census to
# the other six replicated key columns so a future plan/harness change
# can't reopen the class on a column nobody is watching.
#
# Classification per (column, modulus):
#   "recurs"  — the modulus divides the replica shift, so every planted
#               class recurs identically per replica (shift % m == 0,
#               asserted below);
#   "density" — the shift rotates the class labels, but the consuming
#               semantics depend only on class DENSITY on a contiguous
#               key range (planted-dirt CASE branches, drift/corruption
#               classes, uniform shard buckets, query/eval sets — each
#               reason audited r10/r11), so rotation preserves linear
#               scaling. A dividing modulus classified "density" (or
#               vice versa) fails, keeping the census exact.
# Shifts are IMPORTED from the harness (r12 ADVICE) — a future change
# to any tools/scale_stress.py shift constant flows into the census
# automatically instead of passing against a stale inline copy.
_KEY_SHIFTS = {
    "vec_id": SHIFT,
    "event_id": SHIFT,
    "user_id": EVENT_USER_SHIFT,
    "o_orderkey": ORDERKEY_SHIFT,
    "c_custkey": CUSTKEY_SHIFT,
    "o_custkey": CUSTKEY_SHIFT,   # shifts in lockstep with c_custkey
    "l_orderkey": ORDERKEY_SHIFT,
}
_KEY_MODULI: dict[str, dict[int, str]] = {
    "vec_id": {
        100: "recurs",   # QUERY_MOD: ANN/decontaminate query sets
        67: "density",   # CENTROID_MOD: IVF coarse-centroid set (~1/67)
        7: "density",    # MMR_CAND_MOD: candidate pool density
        97: "density",   # DECON_EVAL_MOD: eval-set rotation documented
    },
    "event_id": {
        2: "recurs", 5: "recurs", 10: "recurs",
        8: "recurs",     # AUDIT_BUCKETS
        16: "recurs",    # SKIP_FILES
        1000: "recurs",  # ID_LOSS_MOD (planted loss class)
        3: "density",    # case-format / planted-'N/A' branches
        7: "density",    # NULLQ_MOD planted-null class
        13: "density",   # CORRUPT_MOD corrupt-row class
        199: "density",  # range-join interval anchors
    },
    "user_id": {10: "recurs", 5: "recurs", 8: "recurs"},
    "o_orderkey": {
        2: "recurs", 3: "recurs", 4: "recurs", 10: "recurs",
        16: "recurs",    # CHECKSUM_BUCKETS
        256: "recurs",   # 1 << Z_BITS z-order cell
        97: "density",   # REPAIR_MISS_MOD drift class
        89: "density",   # REPAIR_CORRUPT_MOD drift class
        7: "density",    # _DIFF_UPD (snapshot_diff — outside stress set)
        13: "density",   # _DIFF_INS (same)
        19: "density",   # _DIFF_DEL (same)
        9: "density",    # planted-'NaN' dirty class
        11: "density",   # planted-'0000-00-00' dirty class
    },
    "c_custkey": {
        11: "recurs",    # LATE_DIM_MOD (143 | 1.43M)
        13: "recurs",    # NEVER_DIM_MOD
        8: "recurs",     # uniform shard bucket
        7: "density",    # _DIRTY_MOD dirty-feed class
    },
    "o_custkey": {
        256: "density",  # 1 << Z_BITS z-order cell (zorder layout) —
                         # uniform sharding bucket; 1.43M % 256 == 240
                         # rotates cell labels, per-cell row counts
                         # stay ~uniform so layout work scales linearly
    },
    "l_orderkey": {},
}


def _scan_column_moduli(col: str) -> set[int]:
    """Every modulus applied to ``col`` anywhere in the package, both
    syntactic forms, digit or constant-named (incl. ``1 << NAME``)."""
    import glob
    import os

    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "automatic_etl_spark")
    digit_re = re.compile(col + r"\"?\)?\s*%\s*(\d[\d_]*)")
    name_re = re.compile(col + r"\"?\)?\s*%\s*\{?([A-Z_][A-Z_0-9]*)\}?")
    shift_re = re.compile(col + r"\"?\)?\s*%\s*\{1\s*<<\s*([A-Z_][A-Z_0-9]*)\}")
    used: set[int] = set()
    names: set[str] = set()
    shifts: set[str] = set()
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(f).read()
        used |= {int(m.replace("_", "")) for m in digit_re.findall(src)}
        names |= set(name_re.findall(src))
        shifts |= set(shift_re.findall(src))
    if names or shifts:
        consts = _plan_module_constants()
        missing = (names | shifts) - set(consts)
        assert not missing, f"{col}: unresolved constant moduli {missing}"
        used |= {consts[n] for n in names}
        used |= {1 << consts[n] for n in shifts}
    return used


def test_replicated_key_moduli_census():
    for col, shift in _KEY_SHIFTS.items():
        expected = _KEY_MODULI[col]
        found = _scan_column_moduli(col)
        assert found == set(expected), (
            f"{col}: moduli census drifted — found {sorted(found)}, "
            f"classified {sorted(expected)}. Classify the new modulus "
            "(recurs/density with a reason) and check the replica shift "
            "still scales its consumer linearly."
        )
        for m, cls in expected.items():
            divides = shift % m == 0
            assert divides == (cls == "recurs"), (
                f"{col} % {m}: classified '{cls}' but shift {shift} "
                f"{'divides' if divides else 'does not divide'} — "
                "reclassify to keep the census exact"
            )


def test_replicated_key_range_clamps_census():
    """The exact r10 failure shape: a RANGE CLAMP on a replicated key
    column silently excludes stress replicas. Census every `<col> <
    BOUND` / `<col> >= BOUND` comparison against an UPPERCASE constant
    or literal bound; each must be one of the two audited clamps:
    doc_id vs PLANT_OFFSET (stress-safe by the DOC_SHIFT pins above)
    and snapshot_diff's o_orderkey vs _DIFF_SHIFT (deliberate
    anti-collision guard — and that query must stay OUT of the stress
    set, asserted here)."""
    import glob
    import os

    from tools.scale_stress import QUERIES

    allowed = {("doc_id", "PLANT_OFFSET"), ("o_orderkey", "_DIFF_SHIFT")}
    cols = "|".join(["doc_id", *_KEY_SHIFTS])
    # All four comparators (r12 ADVICE — the old `<|>=` let a future
    # `<=`/`>` clamp evade the census). The trailing (?![A-Z_0-9.])
    # cannot be defeated by backtracking (r12 ADVICE — the old
    # `*(?!\.)` truncated dotted names like `LIMIT.value` to "LIMI"):
    # a constant name must end before any dot or further name char.
    clamp_re = re.compile(
        rf"({cols})\"?\)?\s*(?:<=?|>=?)\s*"
        rf"\{{?([A-Z_][A-Z_0-9]*(?![A-Z_0-9.])|\d[\d_]*)\}}?"
    )
    # Any DOTTED bound is censused separately (r12 review find: the
    # lookahead above makes `doc_id < LIMITS.MAX` invisible, where the
    # pre-fix regex at least fired via a truncated spurious entry).
    # This catches namespaced constants AND column refs; each audited
    # entry below is a bound that SCALES WITH THE CORPUS (so replicas
    # are never excluded — the class this census exists to catch is a
    # CONSTANT bound):
    #   b.doc_id / b.vec_id — pair-ordering predicates in self-join
    #     dedup (a.key < b.key keeps one ordering of each pair);
    #   med.m / F.col(...) — the SQL and Column forms of data-derived
    #     bounds (embedding_drift_epochs splits at the median vec_id,
    #     Column form `F.col("m")`) and of the same pair-ordering
    #     (F.col("a.doc_id") < F.col("b.doc_id")). The F.col ARGUMENT
    #     is captured (r12 ADVICE — a bare `F.col` allowlist entry
    #     would wave through ANY future F.col bound on these columns,
    #     e.g. a constant-valued `F.col("config_limit")`); an F.col
    #     call whose argument isn't a plain string literal captures
    #     as bare `F.col`, which is NOT allowlisted → census fails →
    #     human audit. Fail-closed by construction.
    dotted_allowed = {
        ("doc_id", "b.doc_id"), ("vec_id", "b.vec_id"),
        ("vec_id", "med.m"),
        ("doc_id", 'F.col("b.doc_id")'), ("vec_id", 'F.col("m")'),
    }
    dotted_re = re.compile(
        rf"({cols})\"?\)?\s*(?:<=?|>=?)\s*"
        rf"([A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_0-9]+)+"
        rf"(?:\(\"[^\"]*\"\)|\('[^']*'\))?)"
    )
    # BETWEEN is a range clamp too (r12 ADVICE): census both the
    # Column form `.between(` and SQL `BETWEEN` on the same columns.
    between_re = re.compile(
        rf"({cols})\"?\)?\s*(?:\.between\(|between\s)", re.IGNORECASE
    )
    pkg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "automatic_etl_spark")
    found = set()
    dotted = set()
    betweens = set()
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(f).read()
        found |= {(c, b) for c, b in clamp_re.findall(src)}
        dotted |= {(c, b) for c, b in dotted_re.findall(src)}
        betweens |= {(os.path.basename(f), c)
                     for c in between_re.findall(src)}
    unexpected_dotted = dotted - dotted_allowed
    assert not unexpected_dotted, (
        f"unaudited dotted-expression clamp(s) on replicated key "
        f"columns: {unexpected_dotted} — classify (corpus-scaling "
        "bound vs constant) and extend dotted_allowed with the reason"
    )
    assert dotted == dotted_allowed, (
        f"dotted-bound census went blind: only saw {dotted}"
    )
    assert not betweens, (
        f"unaudited BETWEEN clamp(s) on replicated key columns: "
        f"{betweens} — audit against every replica shift and extend "
        "this census"
    )
    unexpected = found - allowed
    assert not unexpected, (
        f"unaudited range clamp(s) on replicated key columns: "
        f"{unexpected} — the r10 silent-constant-corpus class; audit "
        "the clamp against every replica shift and extend the allowlist"
    )
    assert found == allowed, f"clamp census went blind: only saw {found}"
    assert "snapshot_diff" not in QUERIES, (
        "snapshot_diff entered the stress set but its o_orderkey < "
        "_DIFF_SHIFT clamp excludes replicas above the bound"
    )


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
