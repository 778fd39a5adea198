"""Hypothesis property tests for the round-6 production-ops pack:
the fixture-based units in test_ops_pack6.py pin ground truth on the
shipped data; these generate RANDOM inputs and check the operator
cores against pure-Python references — the laws must hold for any
input, not just the fixtures.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

PROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@PROP
@given(
    keys=st.lists(
        st.integers(min_value=1, max_value=60),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_merge_three_way_laws_random_keys(spark, keys):
    """The MERGE CASE classification over a full-outer join equals
    set arithmetic on any key population (the registry query's fixed
    mods, applied to random key sets)."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    tgt = df.where(F.col("k") % 3 != 0).select("k", F.lit(1).alias("t"))
    src = df.where(F.col("k") % 2 == 0).select(
        "k",
        F.when(F.col("k") % 10 == 0, "d").otherwise("u").alias("op"),
    )
    joined = tgt.join(src, "k", "full_outer")
    action = (
        F.when(F.col("op").isNull(), "kept")
        .when(F.col("t").isNull() & (F.col("op") == "d"), "skipped_delete")
        .when(F.col("t").isNull(), "inserted")
        .when(F.col("op") == "d", "deleted")
        .otherwise("updated")
    )
    got = {
        r.action: r.c
        for r in joined.select(action.alias("action"))
        .groupBy("action")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    tset = {k for k in keys if k % 3 != 0}
    sset = {k for k in keys if k % 2 == 0}
    dels = {k for k in sset if k % 10 == 0}
    truth = {
        "kept": len(tset - sset),
        "updated": len((tset & sset) - dels),
        "deleted": len(tset & dels),
        "inserted": len((sset - tset) - dels),
        "skipped_delete": len(dels - tset),
    }
    assert got == {a: n for a, n in truth.items() if n}


@PROP
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # start offset s
            st.integers(min_value=1, max_value=500),     # duration
        ),
        min_size=1,
        max_size=60,
    )
)
def test_two_phase_concurrency_equals_sweep(spark, data):
    """The slice-decomposed boundary sweep equals the sequential
    sweep for arbitrary interval sets, at a slice width (64) far
    smaller than the production hour so slice boundaries are
    exercised constantly."""
    slice_w = 64
    rows = [(s, s + d) for s, d in data]
    iv = spark.createDataFrame(rows, "s long, e long")
    b = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    ).withColumn(
        "slice", F.call_function("div", F.col("t"), F.lit(slice_w))
    )
    w_local = (
        Window.partitionBy("slice")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.select("slice", "delta", F.sum("delta").over(w_local).alias("run"))
    slices = local.groupBy("slice").agg(
        F.sum("delta").alias("tot"), F.max("run").alias("loc_max")
    )
    w_off = Window.orderBy("slice").rowsBetween(Window.unboundedPreceding, -1)
    peak = (
        slices.select(
            (
                F.coalesce(F.sum("tot").over(w_off), F.lit(0))
                + F.col("loc_max")
            ).alias("cand")
        )
        .agg(F.max("cand").alias("p"))
        .collect()[0]
        .p
    )
    bounds = sorted([(s, 1) for s, _ in rows] + [(e, -1) for _, e in rows])
    run = expect = 0
    for _, d in bounds:
        run += d
        expect = max(expect, run)
    assert peak == expect


@PROP
@given(
    cohort=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # time
            st.booleans(),                          # event vs censored
        ),
        min_size=1,
        max_size=40,
    )
)
def test_km_log_survival_random_cohorts(spark, cohort):
    """The DataFrame KM core (risk sets from cumulative exits,
    log-survival from rounded ln-terms) matches the sequential KM
    recurrence on arbitrary cohorts — skipping the degenerate
    last-time case where everyone at risk dies (ln 0)."""
    n = len(cohort)
    # drop degenerate all-events-at-max-time inputs up front
    times = sorted({t for t, _ in cohort})
    at_risk = n
    for t in times:
        d_i = sum(1 for tt, e in cohort if tt == t and e)
        c_i = sum(1 for tt, e in cohort if tt == t and not e)
        if d_i == at_risk:
            return  # degenerate: survival hits exactly 0 — out of scope
        at_risk -= d_i + c_i
    df = spark.createDataFrame(
        [(t, int(e)) for t, e in cohort], "t int, ev int"
    )
    km = df.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c_i"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = km.select(
        "t", "d_i", "c_i",
        (
            F.lit(n)
            - F.coalesce(
                F.sum(F.col("d_i") + F.col("c_i")).over(w_prev), F.lit(0)
            )
        ).alias("n_risk"),
    )
    log_term = F.round(
        F.log(1.0 - F.col("d_i").cast("double") / F.col("n_risk")), 8
    ).cast("decimal(18,8)")
    got = {
        r.t: (r.n_risk, float(r.ls))
        for r in risk.select(
            "t", "d_i",
            F.col("n_risk"),
            F.sum(log_term).over(w_cum).alias("ls"),
        )
        .where(F.col("d_i") > 0)
        .collect()
    }
    at_risk, logsum = n, 0.0
    for t in times:
        d_i = sum(1 for tt, e in cohort if tt == t and e)
        c_i = sum(1 for tt, e in cohort if tt == t and not e)
        if d_i > 0:
            logsum += round(math.log(1 - d_i / at_risk), 8)
            exp_risk, exp_ls = got[t]
            assert exp_risk == at_risk
            # compare the decimal-exact Spark sum against the float-
            # accumulated recurrence directly: a re-round to 6 dp on
            # both sides (the pre-r11 form) was half-boundary-fragile —
            # sums of 8-dp terms routinely land ON 6-dp halves, where
            # ~1e-16 float accumulation error flips Python's round()
            # (hypothesis found sum=-0.7717095 → -0.771709 vs -0.77171).
            # Tolerance 1e-9 covers ≤40 terms of float error (~4e-15)
            # and stays far below the 1e-8 term grid.
            assert abs(exp_ls - logsum) < 1e-9
        at_risk -= d_i + c_i
    assert len(got) == sum(
        1 for t in times if any(tt == t and e for tt, e in cohort)
    )
