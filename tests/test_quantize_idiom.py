"""Pins for the cross-engine quantize idiom (r10 verdict #1 + ADVICE).

Native ``round(x, k)`` on a computed double is engine-specific within
1 ulp of a k-dp half boundary (Spark: exact-binary HALF_UP via
BigDecimal; DuckDB: rounds the 10^k-scaled double) — the class behind
the r8 LM-score and r9 pseudo-sf1 divergences. Round 10 swept every
render to ``qround``/floor-quantize on both engines; these pins keep
the sweep from regressing:

1. No floor-quantize render may contain an inner native round, in
   Spark source or oracle SQL (the redundant round-then-quantize form
   the r10 verdict ordered removed).
2. Every dsum/qround SQL fragment's multiplier exponent must equal its
   divisor exponent (ADVICE r9: the hand-duplicated pairs can drift;
   new sites should generate both from ``_sql_dsum``/``_sql_qround``,
   and this pin makes a typo at any site — old or new — fail loudly).
3. The surviving native-round sites are an explicit allowlist. They
   are safe by construction, in two classes only:
   - scale-0 integer rounds (``round(x)``): no 10^k scaling happens on
     either engine, so both round the SAME double half-away-from-zero;
   - 2-dp decimal-grid recovery (``round(x, 2)`` where x is a source
     value that carries exactly 2 decimals): the input sits within an
     ulp of the 0.01 grid, never near a half boundary.
   A new native round in any plan/operator/function file changes a
   count below and must either convert to qround or justify itself
   here.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "automatic_etl_spark")


def _sources() -> dict[str, str]:
    return {
        os.path.relpath(f, REPO): open(f).read()
        for f in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)
    }


def _oracles() -> dict[str, str]:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return entry.oracle_sql()


def test_no_native_round_inside_quantize_render_source():
    """Spark side: no F.floor(...F.round(...)...) and no qround(F.round."""
    bad = []
    for name, src in _sources().items():
        for pat in (
            r"F\.floor\(\s*\(?\s*F\.round\(",
            r"qround\(\s*F\.round\(",
        ):
            if re.search(pat, src):
                bad.append((name, pat))
    assert not bad, f"native round feeding a quantize render: {bad}"


def test_no_native_round_inside_quantize_render_sql():
    """Oracle side: no floor((round(...)) — the r10-removed form."""
    bad = [
        name
        for name, sql in _oracles().items()
        if re.search(r"floor\(\s*\(?\s*round\(", sql)
    ]
    assert not bad, f"oracle quantize renders with inner native round: {bad}"


def test_sql_quantize_multiplier_matches_divisor():
    """Every dsum/qround oracle fragment: multiplier 1eK == divisor 1eK.

    The dsum shape is rigid (... * 1eK + 0.5) AS BIGINT)) AS DOUBLE)
    / 1eK; the qround shape is floor(... * 1eK + 0.5) / 1eK. Both
    regexes anchor on the rigid tail so nested parens don't matter.
    """
    dsum_re = re.compile(
        r"\*\s*1e(\d+)\s*\+\s*0\.5\)\s*AS\s+BIGINT\)\)\s*AS\s+DOUBLE\)"
        r"\s*/\s*1e(\d+)",
        re.S,
    )
    qround_re = re.compile(r"\*\s*1e(\d+)\s*\+\s*0\.5\)\s*/\s*1e(\d+)", re.S)
    bad = []
    n_seen = 0
    for name, sql in _oracles().items():
        for pat, kind in ((dsum_re, "dsum"), (qround_re, "qround")):
            for k, j in pat.findall(sql):
                n_seen += 1
                if k != j:
                    bad.append((kind, name, k, j))
    assert not bad, f"multiplier/divisor drift: {bad}"
    # the idiom is in active use — a regex typo that matches nothing
    # would silently void this pin
    assert n_seen >= 150, f"expected >=150 quantize fragments, saw {n_seen}"


# file -> (count, why it is allowed). Classes per module docstring.
_ALLOWED_NATIVE_F_ROUND = {
    "plans/discovery_plans.py": (1, "scale-0 cents: round(o_totalprice*100)"),
    "plans/enrichment_plans.py": (
        2,
        "round(x,2) decimal-grid recovery on 2-dp source values",
    ),
    "plans/integrity_plans.py": (
        3,
        "scale-0 cents: round(price*100) exact-grid recovery",
    ),
    "plans/mixing_plans.py": (1, "scale-0 token allocation round(budget*w)"),
    "plans/profiling_plans.py": (1, "scale-0 cardinality estimate round(x)"),
}


def test_native_f_round_allowlist():
    found = {}
    for name, src in _sources().items():
        rel = name.removeprefix("automatic_etl_spark/")
        n = len(re.findall(r"F\.round\(", src))
        if n:
            found[rel] = n
    expected = {k: v[0] for k, v in _ALLOWED_NATIVE_F_ROUND.items()}
    assert found == expected, (
        f"native F.round sites drifted: found {found}, allowed {expected}. "
        "Convert new sites to qround (functions/quantize.py) or extend the "
        "allowlist with a bounded-rationale."
    )


def test_every_native_f_round_site_carries_a_classification():
    """r10 verdict #3: the file-level allowlist bounds COUNTS, but each
    surviving site must also carry its own boundary argument so the
    classification is auditable in place. Convention: a ``# round-ok:``
    comment on the F.round line or within the 5 lines above it, stating
    why the input can never sit near an engine-divergent half boundary.
    A NEW F.round site without one fails here even if someone also bumps
    the count allowlist."""
    bad = []
    for name, src in _sources().items():
        lines = src.splitlines()
        for i, line in enumerate(lines):
            if "F.round(" not in line:
                continue
            window = lines[max(0, i - 5) : i + 1]
            if not any("# round-ok" in w for w in window):
                bad.append(f"{name}:{i + 1}")
    assert not bad, (
        "F.round site(s) without a '# round-ok:' boundary argument "
        f"within 5 lines: {bad}"
    )


def test_scaled_native_f_round_only_at_allowed_scales():
    """Any F.round WITH a scale argument must be scale 2 (grid
    recovery); scale-0 rounds carry no argument. Scales >= 3 on
    computed doubles are the divergence class and must use qround."""
    bad = []
    for name, src in _sources().items():
        for m in re.finditer(r"F\.round\(([^()]*(?:\([^()]*\))?[^()]*)\)", src):
            arg = m.group(1)
            scale = re.search(r",\s*(\d+)\s*$", arg)
            if scale and int(scale.group(1)) != 2:
                bad.append((name, m.group(0)[:60]))
    assert not bad, f"scaled native F.round outside the 2-dp class: {bad}"
