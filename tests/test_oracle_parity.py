"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import os

import pytest

from automatic_etl_spark.plans.all_plans import REGISTRY
from tests.oracle_utils import compare

ORACLE_NAMES = sorted(n for n, (_f, o) in REGISTRY.items() if o is not None)
ROWS_ONLY_NAMES = sorted(n for n, (_f, o) in REGISTRY.items() if o is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn, oracle = REGISTRY[name]
    ok, msg = compare(fn(spark, sf_dir), duck, oracle)
    assert ok, f"{name}: {msg}"


# Queries whose plans contain a sort, limit, window, or sessionization
# — the shapes where partitioning/merge order could leak into results.
# The driver runs at local[32]; the suite runs at 8; this sweep re-runs
# each at 2 and 27 shuffle partitions so any order-sensitivity (e.g. a
# non-total ORDER BY + LIMIT over non-unique fixture keys, the
# limit_scan round-1 bug) fails in-repo before the driver sees it.
ORDER_SENSITIVE = [
    n
    for n in (
        "recent_n", "top_k_users", "limit_scan", "shipping_priority",
        "returned_item_customers", "large_order_customers",
        "dedup_latest", "dedup_subset", "ranking_functions",
        "sessionization", "session_window_native", "asof_join_lag",
        "daily_moving_avg", "scd2_history", "groupwise_max_orders",
        "value_percentiles", "countmin_heavy_hitters",
        "waiting_suppliers", "nation_profit", "min_cost_supplier",
        # round-4 additions with rank/top-k/iterative shapes
        "sample_scan", "embedding_quantize_recall",
        "near_dup_canonical", "top_bigram_fraction",
        "streaming_upsert_pipe",
        # round-5 additions with window/rank shapes
        "sequence_packing", "bm25_topk", "incremental_dedup",
        "reservoir_per_group", "fuzzy_match_recovery",
        "outlier_iqr_report", "bpe_merge_mining", "winsorize_stats",
        "value_histogram_equidepth", "cluster_top_terms",
        # round-6 additions with top-N / rank / vocab-cut shapes
        "event_transition_matrix", "cooccurrence_lift",
        "oov_rate_report", "golden_record_merge", "string_agg_surface",
    )
    if n in ORACLE_NAMES
]


@pytest.mark.parametrize("parts", [2, 27])
@pytest.mark.parametrize("name", ORDER_SENSITIVE)
def test_order_sensitive_partition_sweep(name, parts, spark, duck, sf_dir):
    fn, oracle = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        ok, msg = compare(fn(spark, sf_dir), duck, oracle)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert ok, f"{name} @ shuffle.partitions={parts}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(name, spark, sf_dir):
    fn, _ = REGISTRY[name]
    rows = fn(spark, sf_dir).collect()
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_date", "event_type", "cnt", "total_value"}


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_bench_headliners_are_registered():
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench names not in registry: {missing}"


def test_check_priority_names_exist():
    """Registry-name drift guard: every rotation entry must exist (a
    missing one means a promised query was never implemented — the
    round-3 silent-drop failure mode), and the window must be unique
    so all 50 driver-checked slots carry distinct signal."""
    import __spark_entry__ as e

    missing = [n for n in e._CHECK_PRIORITY if n not in REGISTRY]
    assert not missing, f"_CHECK_PRIORITY names not in registry: {missing}"
    assert len(e._CHECK_PRIORITY) == len(set(e._CHECK_PRIORITY))


def test_pointer_doubling_log_rounds_on_chain(spark):
    """A 64-node path graph has diameter 63: plain label propagation
    needs ~63 rounds (raises at max_iter=10), hook+compress converges
    within 10 — the O(log d) claim, demonstrated, and both variants
    agree exactly where both converge."""
    import pytest as _pytest

    from automatic_etl_spark.operators.graph import connected_components

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    with _pytest.raises(RuntimeError):
        connected_components(nodes, edges, max_iter=10).collect()
    fast = connected_components(nodes, edges, max_iter=10, compress=True)
    assert {(r.node, r.component) for r in fast.collect()} == {
        (i, 0) for i in range(n)
    }
    slow = connected_components(nodes, edges, max_iter=70)
    assert sorted(map(tuple, slow.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_near_dup_cc_round_count_pinned(spark, sf_dir):
    """Round-count pin for the fixture chain corpus (VERDICT r7 #3):
    the planted clusters are {d, d+1M, d+2M}. At sf0.001/sf0.01 every
    triangle edge clears Jaccard (diameter 1 → 2 plain rounds: 1
    effective + the no-change probe); at sf0.1 the long-suffix edge
    d↔d+2M fails verification on some docs, leaving 3-node paths
    (diameter 2 → 3 plain rounds — the number in COVERAGE.md's
    attribution). Pointer doubling stays at 2 in both regimes. Any count above these means the verified edge set — and
    near_dup_canonical's cost — changed shape; re-run
    tools/attr_near_dup.py and update COVERAGE.md in the same commit.
    """
    from automatic_etl_spark.operators.graph import connected_components
    from automatic_etl_spark.plans.curation_plans import _near_dup_edges

    # keyed on the fixture NAME (env overrides / symlinks / trailing
    # slashes must not silently select the wrong pin), and unknown
    # fixtures fail loudly instead of defaulting
    expected_plain = {"sf0.001": 2, "sf0.01": 2, "sf0.1": 3}
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    assert sf_name in expected_plain, (
        f"no round-count pin recorded for fixture {sf_name!r} — "
        "measure it (tools/attr_near_dup.py) and add it here"
    )
    corpus, edges = _near_dup_edges(spark, sf_dir)
    nodes = corpus.select("doc_id")
    plain_stats: dict = {}
    plain = connected_components(nodes, edges, stats=plain_stats)
    fast_stats: dict = {}
    fast = connected_components(
        nodes, edges, compress=True, stats=fast_stats
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, fast.collect())
    )
    assert plain_stats["rounds"] == expected_plain[sf_name]
    assert fast_stats["rounds"] == 2


def test_connected_components_explicit_graph(spark):
    """Chain a-b-c, triangle d-e-f, singleton g → 3 components labeled
    by their minimum node id."""
    from automatic_etl_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)], "a_id long, b_id long"
    )
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}


def test_bench_final_json_line_stays_compact():
    """BENCH_r05 and BENCH_r06 were both lost because the final stdout
    line outgrew the driver's capture window, which r6 measured to be a
    2,000-char stdout TAIL. The contract is now: stdout carries the
    headline total plus only the slowest-10 pairs; the full per-query
    map goes to logs/bench_detail.json. Pin the REAL render path
    (bench.render_final_line) at worst case for the CURRENT headliner
    set and bound it at 1,500 chars."""
    import json

    import bench

    worst_timings = {n: 99999.999 for n in bench.HEADLINE}
    worst_errors = {n: "boom" for n in bench.HEADLINE}
    line = bench.render_final_line(worst_timings, worst_errors, sf=0.1)
    assert len(line) <= 1500, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["queries_expected"] == len(bench.HEADLINE)
    assert len(parsed["queries"]) <= 10
    # headline total must survive truncation no matter what
    assert parsed["value"] == round(sum(worst_timings.values()), 3)
