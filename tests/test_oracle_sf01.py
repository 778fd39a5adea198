"""sf0.01 oracle tier — the DRIVER'S scale, in-repo.

The round-4 escape (`decimal_fidelity_agg`): every oracle passed the
local gate at sf0.001 and one failed at the driver's sf0.01, because
scale-dependent drift (more rows → more boundary values, different
canonical representations) never ran in-repo. This tier runs the
whole `__spark_entry__._CHECK_PRIORITY` list — the 50-query window
the driver will compare this round PLUS the cohort pre-staged for the
next round — at sf0.01 with the same comparator, so that class of
drift fails here first.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from automatic_etl_spark.plans.all_plans import REGISTRY
from automatic_etl_spark.sources.parquet import TABLES
from tests.oracle_utils import compare

SF01_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01_DIR), reason="sf0.01 fixtures not present"
)


def _window_names() -> list[str]:
    import __spark_entry__ as e

    return [n for n in e._CHECK_PRIORITY if REGISTRY[n][1] is not None]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF01_DIR, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _window_names())
def test_driver_window_matches_oracle_at_sf01(name, spark, duck01):
    fn, oracle = REGISTRY[name]
    ok, msg = compare(fn(spark, SF01_DIR), duck01, oracle)
    assert ok, f"{name} @ sf0.01: {msg}"
