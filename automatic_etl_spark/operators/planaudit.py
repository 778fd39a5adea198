"""Executed-plan fingerprinting — the anti-regression instrument.

A query can stay value-correct while its physical plan silently
degrades (a broadcast join falling back to shuffle, a window group
limit lost, an extra exchange from a careless repartition). At 100 TB
those regressions are the difference between minutes and hours, and
row-level oracles never see them. ``plan_fingerprint`` reduces the
AQE-final executed plan to the operator counts that matter at scale;
tests/test_plan_fingerprints.py pins them for the most expensive
registry queries, and tools/gen_plans_report.py renders the full
table (PLANS.md).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# (plan-text marker, short name). 'Exchange' is special-cased below:
# only SHUFFLE exchanges count (BroadcastExchange is the cheap kind,
# chosen on purpose).
MARKS: tuple[tuple[str, str], ...] = (
    ("BroadcastHashJoin", "bhj"),
    ("SortMergeJoin", "smj"),
    ("ShuffledHashJoin", "shj"),
    ("BroadcastNestedLoopJoin", "bnlj"),
    ("WindowGroupLimit", "wgl"),
    ("TakeOrderedAndProject", "topN"),
    ("partial_", "partialAgg"),
)


# First operator token of a plan line: skip the tree-drawing prefix
# (spaces, ':', '+', '-') and the codegen marker '*(<id>)'.
_OP_RE = re.compile(r"^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9_]*)")


def final_plan_text(df: DataFrame, execute: bool = True) -> str:
    """The AQE-FINAL executed-plan text (initial-plan section cut) —
    the ONE derivation both the fingerprint and the PLANS.md report
    slice from, so they can never disagree on what 'the plan' is."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints final + initial plans; count only final
    return plan.split("+- == Initial Plan ==")[0]


def plan_fingerprint(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """Operator counts of ``df``'s executed plan (AQE-final).

    ``execute=True`` collects first — required for the FINAL adaptive
    plan; the initial plan's join strategies and exchange counts are
    pre-runtime guesses AQE may replace.

    ``exch`` counts lines whose OPERATOR is ``Exchange`` — a raw
    substring count would be corrupted by reuse: every
    ``ReusedExchange [...], Exchange hashpartitioning(...)`` line
    contains the word twice, so reuse INFLATED the count and losing
    reuse (a real regression) could LOWER it (r7 review finding; the
    whole pin table was re-measured when this was fixed).
    """
    plan = final_plan_text(df, execute=execute)
    counts = {short: plan.count(mark) for mark, short in MARKS}
    ops = [
        m.group(1)
        for m in (_OP_RE.match(line) for line in plan.splitlines())
        if m
    ]
    counts["exch"] = sum(1 for o in ops if o == "Exchange")
    return counts
