"""Invariant tests for the round-6 discovery pack — laws the oracle
parity sweep cannot express: information-theoretic bounds, ground
truth about the fixture's real keys/FKs, and probability-mass
conservation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from automatic_etl_spark.plans.all_plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_candidate_key_ground_truth(spark):
    """c_custkey is THE candidate key of customer in every fixture;
    low-cardinality attributes must never qualify."""
    rows = {
        r.column_name: r
        for r in REGISTRY["candidate_key_report"][0](spark, SF).collect()
    }
    assert rows["c_custkey"].is_candidate_key
    assert not rows["c_nationkey"].is_candidate_key
    assert not rows["c_mktsegment"].is_candidate_key
    for r in rows.values():
        assert 0 < r.n_distinct <= r.n_rows
        assert 0.0 < r.uniqueness <= 1.0


def test_fd_structural_holds_behavioral_does_not(spark):
    """nation_key→region_key is structural (holds by construction);
    the behavioral FDs must report quantified violations, and
    violating_groups must be consistent with the holds flag."""
    rows = {
        r.fd: r
        for r in REGISTRY["functional_dependency_audit"][0](
            spark, SF
        ).collect()
    }
    nat = rows["nation.n_nationkey->n_regionkey"]
    assert nat.holds and nat.violating_groups == 0
    for r in rows.values():
        assert r.holds == (r.violating_groups == 0)
        assert r.max_dep_values >= 1
        assert 0 <= r.violating_groups <= r.n_groups


def test_fk_containment_ground_truth(spark):
    """The three star-schema FKs are fully contained; the deliberate
    near-miss (nationkey vs regionkey) must NOT be flagged as an FK
    but must show partial overlap (regionkeys are a prefix of
    nationkeys in TPC-H shape)."""
    rows = {
        r.pair: r
        for r in REGISTRY["fk_discovery_containment"][0](spark, SF).collect()
    }
    for pair in (
        "orders.o_custkey->customer.c_custkey",
        "lineitem.l_partkey->part.p_partkey",
        "lineitem.l_suppkey->supplier.s_suppkey",
    ):
        assert rows[pair].is_fk and rows[pair].containment == 1.0
    miss = rows["customer.c_nationkey->region.r_regionkey"]
    assert not miss.is_fk
    assert 0.0 < miss.containment < 1.0
    for r in rows.values():
        assert 0 <= r.contained <= r.child_distinct


def test_entropy_and_gini_bounds(spark):
    """0 <= H <= ln(n_distinct) (uniform maximizes entropy);
    0 <= gini < 1, and gini <= 1 - 1/n_distinct."""
    for r in REGISTRY["column_entropy_profile"][0](spark, SF).collect():
        assert r.n_distinct >= 1
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_distinct) + 1e-6
        assert -1e-6 <= r.gini <= 1.0 - 1.0 / r.n_distinct + 1e-6


def test_benford_mass_conservation(spark):
    """Observed fractions sum to 1 (±rounding); expected fractions
    are the fixed Benford distribution which sums to 1 exactly;
    digits are 1..9."""
    rows = REGISTRY["benford_first_digit"][0](spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-4
    for r in rows:
        expected = math.log10(1.0 + 1.0 / r.digit)
        assert abs(r.expected - expected) < 1e-5
        assert r.cnt > 0


def test_transition_counts_bounded_by_events(spark):
    """Total transitions = n_events - n_users-with-events; the top-20
    slice is bounded by that total and strictly ordered."""
    rows = REGISTRY["event_transition_matrix"][0](spark, SF).collect()
    assert 0 < len(rows) <= 20
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    events = spark.read.parquet(f"{SF}/events.parquet")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(cnts) <= n_events - n_users


def test_lift_symmetric_marginal_identity(spark):
    """Every reported pair has positive support on both marginals and
    lift > 0; pair count can't exceed either marginal."""
    rows = REGISTRY["cooccurrence_lift"][0](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.pair_cnt >= 1
        assert r.lift > 0.0


def test_k_anonymity_accounting(spark):
    """records_below_k < groups_below_k * K, and k_min >= 1; QID
    group count per segment is bounded by 25 nations."""
    rows = REGISTRY["k_anonymity_report"][0](spark, SF).collect()
    assert rows
    K = 5
    for r in rows:
        assert 1 <= r.qid_groups <= 25
        assert r.k_min >= 1
        assert r.records_below_k <= r.groups_below_k * (K - 1)
        assert (r.groups_below_k == 0) == (r.records_below_k == 0)
