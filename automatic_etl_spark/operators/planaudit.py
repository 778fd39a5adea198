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


def plan_fingerprint(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """Operator counts of ``df``'s executed plan (AQE-final).

    ``execute=True`` collects first — required for the FINAL adaptive
    plan; the initial plan's join strategies and exchange counts are
    pre-runtime guesses AQE may replace.
    """
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints final + initial plans; count only final
    plan = plan.split("+- == Initial Plan ==")[0]
    counts = {short: plan.count(mark) for mark, short in MARKS}
    counts["exch"] = plan.count("Exchange") - plan.count("BroadcastExchange")
    return counts
