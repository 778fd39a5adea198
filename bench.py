#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}``.

Headliners cover the engine's hot paths: the star join, window dedup,
whole-table cleaning pipeline, grouped aggregation, rollup, top-N —
the plans whose shape dominates at 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    # relational / BI hot paths
    "revenue_by_nation",
    "pricing_summary",
    "shipping_priority",
    "dedup_latest",
    "grouped_count_multi",
    "rollup_agg",
    "recent_n",
    "daily_moving_avg",
    "reconciliation",
    # cleaning pipeline (whole-table single projection)
    "clean_table_pipeline",
    # CDC path (JSON envelope roundtrip + last-writer-wins)
    "cdc_unwrap_dedup",
    # streaming (availableNow windowed agg)
    "streaming_hourly_counts",
    # analytics view layer
    "analytics_view_dates",
    # custom operators (Spark-lacking surface)
    "asof_join_lag",
    "range_join_windows",
    "time_rollup",
    # training-data ops
    "token_stats",
    "curation_funnel",
    "minhash_lsh_dedup",
    "simhash_buckets",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "embedding_cosine_dedup",
    "multimodal_features",
    # curation suite (round 4): pair→cluster→survivor dedup, PII scan
    "near_dup_canonical",
    "pii_scan_stats",
    # decision-support join strategies (semi / anti / HAVING join-back)
    "priority_semi_count",
    "inactive_customers_anti",
    "large_order_customers",
    # text analysis + training export
    "tfidf_top_terms",
    "stratified_split",
    # approx sketches (the 100 TB distinct/quantile path)
    "hll_distinct_check",
    # iterative + history + stream-stream
    "kmeans_two_iter",
    "scd2_history",
    "groupwise_max_orders",
    "stream_stream_join",
    "text_source_agg",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    from automatic_etl_spark.session import get_spark
    from automatic_etl_spark.plans.all_plans import REGISTRY

    spark = get_spark(app_name="automatic-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen on the SMALLEST fixture first: the same plan
    # shapes generate the same codegen classes, so the measured runs at
    # sf_dir reflect execution, not first-query JIT/compilation. Python
    # workers (mapInPandas paths) spawn here too.
    warm_dir = "/root/testdata/sf0.001"
    import os as _os

    if _os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                REGISTRY[name][0](spark, warm_dir).collect()
            except Exception:
                pass  # measured run will surface real failures
    else:
        REGISTRY["count_star"][0](spark, sf_dir).collect()

    # Per-query fault isolation: one broken query must never zero the
    # whole round's bench signal (BENCH_r03 lesson) — record its error,
    # keep timing the rest, and ALWAYS emit the JSON line.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn, _oracle = REGISTRY[name]
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
