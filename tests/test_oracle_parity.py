"""Every registered query must match its DuckDB oracle at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

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
