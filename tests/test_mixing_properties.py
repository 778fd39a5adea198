"""Invariant tests for the corpus-mixing pack: probability-mass laws,
temperature-flattening direction, and dedup accounting identities.
"""

from __future__ import annotations

from automatic_etl_spark.plans.all_plans import REGISTRY
from automatic_etl_spark.plans.mixing_plans import TOKEN_BUDGET

SF = "/root/testdata/sf0.001"


def test_temperature_mix_mass_and_flattening(spark):
    """Weights sum to 1 (±rounding); allocations sum to the budget
    (±1 token per source from rounding); α<1 FLATTENS the mix: every
    below-average-share source gets weight >= its raw token share,
    every above-average source gets <=."""
    rows = REGISTRY["temperature_mix_allocation"][0](spark, SF).collect()
    assert rows
    total_tokens = sum(r.tokens for r in rows)
    wsum = sum(r.weight for r in rows)
    assert abs(wsum - 1.0) < 1e-4
    alloc = sum(r.allocated_tokens for r in rows)
    assert abs(alloc - TOKEN_BUDGET) <= len(rows)
    for r in rows:
        share = r.tokens / total_tokens
        if share < 1.0 / len(rows):
            assert r.weight >= share - 1e-6
        if share > 1.0 / len(rows):
            assert r.weight <= share + 1e-6
        assert r.epochs > 0.0
        assert abs(r.epochs - r.allocated_tokens / r.tokens) < 1e-5


def test_effective_tokens_accounting(spark):
    """unique <= raw on both docs and tokens; duplication_factor >= 1
    and equals raw/unique tokens; totals match the raw table."""
    rows = REGISTRY["effective_token_report"][0](spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.raw_docs for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r.unique_docs <= r.raw_docs
        assert 1 <= r.unique_tokens <= r.raw_tokens
        assert r.duplication_factor >= 1.0
        assert (
            abs(r.duplication_factor - r.raw_tokens / r.unique_tokens)
            < 1e-5
        )


def test_quality_dedup_mass_conservation(spark):
    """Every doc lands in exactly one quality bucket; dup counts are
    bounded; buckets are within the [0,1]-score range."""
    rows = REGISTRY["quality_dedup_correlation"][0](spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.quality_bucket <= 10
        assert 0 <= r.dup_docs <= r.n_docs
        assert (r.dup_docs == 0) == (r.dup_rate == 0.0)
