"""Property-based tests (hypothesis) for the cleaning expression
library — beyond the reference's fixture-only strategy (SURVEY.md §5):
each property batches every generated example into ONE DataFrame pass,
and asserts the vectorized Column expressions against a pure-Python
model of the reference semantics.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from automatic_etl_spark.functions import cleaning as cl

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Mixed garbage: sentinels, int/float text, raw text.
int_like = st.one_of(
    st.sampled_from(list(cl.NULL_SENTINELS)),
    st.integers(min_value=-(2**40), max_value=2**40).map(str),
    st.integers(min_value=-(2**31), max_value=2**31).map(lambda i: f"{i}.0"),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=12,
    ),
)


def _expected_clean_integer(s: str, pk: bool) -> int | None:
    t = s.strip()
    out = None
    if t not in cl.NULL_SENTINELS:
        try:
            d = float(t)
            if math.isfinite(d) and d == math.floor(d):
                i = int(math.floor(d))
                # try_cast(long) nulls outside int64
                if -(2**63) <= i <= 2**63 - 1:
                    out = i
        except ValueError:
            out = None
    return (0 if out is None else out) if pk else out


@PROP
@given(values=st.lists(int_like, min_size=1, max_size=60), pk=st.booleans())
def test_clean_integers_matches_python_model(spark, values, pk):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [
        r["c"]
        for r in df.select(cl.clean_integers("raw", pk=pk).alias("c")).collect()
    ]
    assert got == [_expected_clean_integer(v, pk) for v in values]


@PROP
@given(values=st.lists(st.text(max_size=40), min_size=1, max_size=60))
def test_normalize_strings_idempotent_and_clean(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    once = cl.normalize_strings("raw")
    twice = cl.normalize_strings(once)
    rows = df.select(once.alias("a"), twice.alias("b")).collect()
    for r in rows:
        assert r["a"] == r["b"]  # idempotent
        if r["a"] is not None:
            assert r["a"] == r["a"].strip()
            assert "  " not in r["a"]
            assert not any(ord(ch) < 0x20 or 0x7F <= ord(ch) <= 0x9F for ch in r["a"])
            assert r["a"] != ""


@PROP
@given(
    years=st.lists(st.integers(min_value=0, max_value=9999), min_size=1, max_size=60)
)
def test_sanitize_dates_year_range(spark, years):
    dates = [f"{y:04d}-06-15" for y in years]
    df = spark.createDataFrame([(d,) for d in dates], "raw string")
    got = [
        r["c"] for r in df.select(cl.sanitize_dates("raw").alias("c")).collect()
    ]
    for y, ts in zip(years, got):
        if 1901 <= y <= 2099:
            assert ts is not None and ts.year == y
            assert (ts.hour, ts.minute, ts.second) == (0, 0, 0)
        else:
            assert ts is None


@PROP
@given(
    values=st.lists(
        st.floats(allow_nan=True, allow_infinity=True), min_size=1, max_size=60
    )
)
def test_clean_floats_and_clamp(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw double")
    rows = df.select(
        cl.clean_floats("raw").alias("f"),
        cl.clamp_numeric(F.col("raw"), "Int16").alias("clamped"),
    ).collect()
    for v, r in zip(values, rows):
        if math.isnan(v) or math.isinf(v):
            assert r["f"] is None
        else:
            assert r["f"] == v
            assert -32768 <= r["clamped"] <= 32767


@PROP
@given(values=st.lists(st.text(max_size=20), min_size=1, max_size=40))
def test_zero_dates_and_sentinels_always_null(spark, values):
    payload = list(cl.ZERO_DATES) + list(cl.NULL_SENTINELS) + values
    df = spark.createDataFrame([(v,) for v in payload], "raw string")
    got = [
        r["c"] for r in df.select(cl.sanitize_dates("raw").alias("c")).collect()
    ]
    for v, ts in zip(payload, got):
        if v.strip() in cl.ZERO_DATES or v.strip() in cl.NULL_SENTINELS:
            assert ts is None
