#!/usr/bin/env python
"""Time individual registry queries with bench.py's methodology
(fresh JVM per invocation, warm on sf0.001, min-of-2 at the target
SF) — the A/B harness for optimization work.

Usage:
    python tools/time_queries.py name1 name2 ...
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... to override.
    TIME_QUERIES_SAMPLES=N for more than 2 samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    assert names, "usage: time_queries.py name1 [name2 ...]"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_samples = int(os.environ.get("TIME_QUERIES_SAMPLES", "2"))

    from automatic_etl_spark.plans.all_plans import REGISTRY
    from automatic_etl_spark.session import get_spark

    unknown = [n for n in names if n not in REGISTRY]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    def _reset() -> None:
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    warm_dir = "/root/testdata/sf0.001"
    out: dict[str, object] = {"loadavg": list(os.getloadavg())}
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        fn, _oracle = REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        fn(spark, warm_dir).collect()  # warm
        samples: list[float] = []
        for _ in range(n_samples):
            _reset()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        runs[name] = samples
        timings[name] = min(samples)
        spark.sparkContext.setJobDescription(None)
    out["queries"] = timings
    out["runs"] = runs
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
