#!/usr/bin/env python
"""Capture explain("formatted") for bench headliners into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r15).

Usage:
    python tools/capture_plans.py before [name ...]   # default: all headliners
    python tools/capture_plans.py after  name ...

Writes plans/<round>/<name>_<tag>.txt. Streaming queries (whose registry
fn runs the stream eagerly and returns a memory-sink scan) still get
their sink-side plan captured, with a header noting the caveat.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_str(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from automatic_etl_spark.plans.all_plans import REGISTRY
    from automatic_etl_spark.session import get_spark
    import bench

    if not names:
        names = list(bench.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name in names:
        fn, _oracle = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            text = explain_str(df)
        except Exception:
            failures.append(name)
            text = "CAPTURE FAILED:\n" + traceback.format_exc()
        dt = time.perf_counter() - t0
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} ({tag}) — plan built in {dt:.2f}s at {sf_dir}\n")
            fh.write(text)
        print(f"{name}: {dt:.2f}s -> {path}")
        # reset temp views/caches some plans leave behind
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
    if failures:
        print("FAILED:", failures)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
