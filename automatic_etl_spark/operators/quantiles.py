"""Scalable exact type-1 quantiles per group.

``grouped_type1_quantiles`` computes, for each group, the type-1
(lower) quantile of a value column at one or more probabilities:
the smallest value whose cumulative count reaches ``ceil(p * n)``.

Why this shape and not ``percentile``/a raw sort window:

- Element SELECTION, not interpolation — the result is a stored
  input double, so it is bit-identical across engines and
  partitionings (no FP-arithmetic drift to pin).
- Value compression — the input first collapses to
  (group, value, count) with a map-side-combined groupBy, and the
  cumulative window runs over the DISTINCT-value frame only. A
  per-group window over raw rows would pull an entire 100 TB group
  into one partition; this is bounded by value cardinality instead.
  (For truly continuous values, pre-bucket to fixed precision first.)
- Probabilities are RATIONALS (num, den): the rank index
  ``ceil(p*n) = floor((num*n + den - 1) / den)`` stays in exact
  integer arithmetic on both engines.

Used by ``outlier_iqr_report`` (Tukey fences) and
``winsorize_stats`` (p05/p95 clamp) in plans/enrichment_plans.py,
whose DuckDB oracles replay the identical construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rank_index(n: Column, num: int, den: int) -> Column:
    """ceil(num/den * n) = (num*n + den-1) div den, pure-integer.

    Spark's ``div`` is integral division on longs — no double ever
    enters, so the index is exact whenever ``num*n + den-1`` fits in
    int64 (the float-division variant used through round 5 lost
    exactness already at 2^53). With percentile-grid numerators
    (num ≤ 99) that is n ≤ ~9.3e16 — two orders of magnitude beyond a
    100 TB row count. DuckDB oracles mirror this with ``//`` on
    BIGINTs.
    """
    return F.call_function(
        "div", (num * n + (den - 1)).cast("long"), F.lit(den).cast("long")
    )


def grouped_type1_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: dict[str, tuple[int, int]],
) -> DataFrame:
    """One row per group: (group_col, n_events, <name> per prob).

    ``probs`` maps output column name -> (numerator, denominator),
    e.g. ``{"q1": (1, 4), "q3": (3, 4)}``.

    NULL values are excluded up front: a quantile over a set
    containing NULL is undefined, and leaving them in would shift the
    cumulative counts by the NULL count (Spark windows order NULLS
    FIRST, DuckDB NULLS LAST — silent cross-engine divergence).
    ``n_events`` therefore counts non-NULL rows only; oracles must
    carry the matching ``WHERE value IS NOT NULL`` in their vc CTE.
    """
    df = df.filter(F.col(value_col).isNotNull())
    vc = df.groupBy(group_col, value_col).agg(F.count("*").alias("c"))
    wc = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.select(
        group_col,
        value_col,
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(Window.partitionBy(group_col)).alias("n"),
    )
    aggs = [F.max("n").alias("n_events")] + [
        F.min(
            F.when(
                F.col("cc") >= _rank_index(F.col("n"), num, den),
                F.col(value_col),
            )
        ).alias(name)
        for name, (num, den) in probs.items()
    ]
    return cum.groupBy(group_col).agg(*aggs)
