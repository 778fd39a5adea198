#!/usr/bin/env python
"""Floor decomposition for stream_stream_join (VERDICT r14 #2).

Phases timed separately, N alternating reps each, in ONE session:
  stage_two_pass — the r14 staging (one filter+coalesce(2) write JOB
                   per side; the events scan runs twice)
  stage_one_pass — the r15 staging (single partitionBy(event_type)
                   write; one scan, one job)
  stream         — the actual stream-stream join on pre-staged dirs
                   (availableNow, memory sink), with the per-batch
                   durationMs breakdown and state-store commit times
                   pulled from recentProgress
  final_agg      — the memory-sink groupBy + collect

Prints one JSON object; commit the output under bench_baselines/.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def stage_two_pass(spark, sf_dir, stage):
    from automatic_etl_spark.sources.parquet import table

    events = table(spark, sf_dir, "events", fan_out=False).select(
        "event_id", "user_id", "event_type", "ts"
    )
    sign_dir = os.path.join(stage, "signups")
    purch_dir = os.path.join(stage, "purchases")
    events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts"
    ).coalesce(2).write.mode("overwrite").parquet(sign_dir)
    events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    ).coalesce(2).write.mode("overwrite").parquet(purch_dir)
    return sign_dir, purch_dir


def stage_one_pass(spark, sf_dir, stage):
    from automatic_etl_spark.sources.parquet import table

    events = table(spark, sf_dir, "events", fan_out=False).select(
        "event_id", "user_id", "event_type", "ts"
    )
    both = os.path.join(stage, "by_type")
    (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
        .coalesce(2)
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(both)
    )
    return (
        os.path.join(both, "event_type=signup"),
        os.path.join(both, "event_type=purchase"),
    )


def run_stream(spark, sign_dir, purch_dir):
    from automatic_etl_spark.scratch import scratch_dir
    from automatic_etl_spark.session import stream_state_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(sign_dir, purch_dir)),
    )
    signups = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(sign_dir)
        .withWatermark("ts", "60 days")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
    )
    purchases = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(purch_dir)
        .withWatermark("ts", "60 days")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "event_id",
        )
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
    )
    name = f"prof_ss_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir("prof_ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return name, list(q.recentProgress)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from automatic_etl_spark.scratch import scratch_dir
    from automatic_etl_spark.session import get_spark

    spark = get_spark(app_name="profile-stream-stream")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf_dir": sf_dir, "reps": reps,
                 "loadavg_start": list(os.getloadavg())}
    times: dict[str, list[float]] = {
        "stage_two_pass": [], "stage_one_pass": [],
        "stream": [], "final_agg": [],
    }
    batch_durations: list[dict] = []
    state_commit_ms: list[float] = []

    stage = scratch_dir("prof_ss_stage")
    # warm both staging paths + the stream once
    stage_two_pass(spark, sf_dir, stage)
    s_dir, p_dir = stage_one_pass(spark, sf_dir, stage)
    run_stream(spark, s_dir, p_dir)

    for _ in range(reps):
        t0 = time.perf_counter()
        stage_two_pass(spark, sf_dir, stage)
        times["stage_two_pass"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        s_dir, p_dir = stage_one_pass(spark, sf_dir, stage)
        times["stage_one_pass"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        name, progress = run_stream(spark, s_dir, p_dir)
        times["stream"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        (
            spark.table(name)
            .groupBy(F.col("s_user").alias("user_id"))
            .agg(
                F.count("*").alias("pair_cnt"),
                F.sum(
                    F.unix_millis("p_ts") - F.unix_millis("s_ts")
                ).alias("lag_ms_total"),
            )
        ).collect()
        times["final_agg"].append(round(time.perf_counter() - t0, 3))

        for p in progress:
            batch_durations.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                }
            )
            for so in p.get("stateOperators", []):
                state_commit_ms.append(so.get("commitTimeMs"))
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    out["times"] = times
    out["medians"] = {
        k: round(statistics.median(v), 3) for k, v in times.items()
    }
    out["batch_durations_last_rep"] = batch_durations[-3:]
    out["state_commit_ms_all"] = state_commit_ms
    out["shuffle_partitions_used"] = __import__(
        "automatic_etl_spark.session", fromlist=["stream_state_partitions"]
    ).stream_state_partitions(s_dir, p_dir)
    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
