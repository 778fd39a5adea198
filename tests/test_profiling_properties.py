"""Invariant tests for the profiling pack: coverage bounds, estimation
identities, and centroid-geometry laws.
"""

from __future__ import annotations

from automatic_etl_spark.plans.all_plans import REGISTRY
from automatic_etl_spark.plans.profiling_plans import (
    EST_BUCKETS,
    OUTLIER_FACTOR,
    VOCAB_K,
)

SF = "/root/testdata/sf0.001"


def test_oov_bounds_and_total(spark):
    """0 <= oov < 1 per source (top-K vocab always covers the most
    frequent tokens, so full-OOV is impossible for a non-empty
    source); in_vocab <= total; totals match a direct token count."""
    rows = REGISTRY["oov_rate_report"][0](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.in_vocab_tokens <= r.total_tokens
        assert 0.0 <= r.oov_rate < 1.0
    # the global vocabulary covers at least VOCAB_K distinct tokens'
    # worth of mass: summed coverage must be positive
    assert sum(r.in_vocab_tokens for r in rows) > 0
    assert VOCAB_K == 1000


def test_pii_name_flags_match_heuristic(spark):
    """name_flag is a pure function of the column name: *_name and
    *_acctbal-like columns flag, segment/type columns don't."""
    rows = {
        r.column_name: r
        for r in REGISTRY["pii_column_discovery"][0](spark, SF).collect()
    }
    assert rows["customer.c_name"].name_flag
    assert rows["supplier.s_name"].name_flag
    assert not rows["customer.c_mktsegment"].name_flag
    assert not rows["part.p_type"].name_flag
    for r in rows.values():
        assert 0 <= r.value_hits <= r.n_rows
        assert 0.0 <= r.hit_rate <= 1.0


def test_join_size_estimate_identities(spark):
    """Per bucket: exact_pairs >= rows²/n_keys (Cauchy-Schwarz — the
    uniformity estimate is a LOWER bound on the true self-join size),
    so est_ratio <= 1 + rounding; and exact_pairs >= rows (c² >= c)."""
    rows = REGISTRY["join_size_estimate_report"][0](spark, SF).collect()
    assert rows
    assert len(rows) <= EST_BUCKETS
    for r in rows:
        assert r.exact_pairs >= r.rows_in_bucket
        assert r.est_pairs <= r.exact_pairs + r.n_keys  # rounding slack
        assert 0.0 < r.est_ratio <= 1.000001


def test_label_centroid_outlier_laws(spark):
    """mean <= max; outliers bounded by Markov: at most cnt/factor
    vectors can exceed factor×mean of a non-negative variable."""
    rows = REGISTRY["label_centroid_outliers"][0](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_dist <= r.max_dist + 1e-9
        assert 0 <= r.n_outliers <= int(r.cnt / OUTLIER_FACTOR)
        if r.max_dist <= OUTLIER_FACTOR * r.mean_dist:
            assert r.n_outliers == 0
