#!/usr/bin/env python
"""Driver-contract check: the verify-skill recipe as a committed tool.

Simulates the round driver in THIS process: a bare SparkSession
(Spark 4 defaults — ANSI on, none of session.get_spark's confs), then
runs every registered query against its DuckDB oracle at the driver's
correctness scale (sf0.01) with the same comparator the in-repo tests
use (strictly stricter than the driver's value-hash).

Usage:
    python tools/driver_check.py                 # full sweep (~3 min)
    python tools/driver_check.py name1 name2 ... # subset
    SPARK_GRAFT_CHECK_SF_DIR=... to point at another fixture dir.

Exit code 0 = everything matches; 1 = any mismatch/error (printed).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get(
        "SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01"
    )
    wanted = set(sys.argv[1:])

    # SPARK_GRAFT_CHECK_MASTER=local[4] reproduces the partitioning-
    # sensitivity probe (COVERAGE r8/r9) without editing this file.
    master = os.environ.get("SPARK_GRAFT_CHECK_MASTER", "local[8]")
    spark = SparkSession.builder.master(master).getOrCreate()  # bare
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from automatic_etl_spark.sources.parquet import TABLES
    from tests.oracle_utils import compare

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = wanted - set(qs)
    if unknown:
        # a typo'd subset name silently checking NOTHING would print
        # "0 mismatches" and exit 0 — fail loudly instead
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    names = [n for n in qs if not wanted or n in wanted]
    bad: list[tuple[str, str]] = []
    t0 = time.time()
    for n in names:
        try:
            if n in oracles:
                ok, msg = compare(qs[n](spark, sf_dir), con, oracles[n])
            else:
                qs[n](spark, sf_dir).collect()
                ok, msg = True, "rows-only"
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            ok, msg = False, f"{type(exc).__name__}: {str(exc)[:200]}"
        if not ok:
            bad.append((n, msg))
            print(f"FAIL {n}: {msg}", file=sys.stderr)
    print(
        f"checked {len(names)} queries at {sf_dir} in "
        f"{time.time() - t0:.0f}s — {len(bad)} mismatches"
    )
    for n, msg in bad:
        print(f"  {n}: {msg[:160]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
