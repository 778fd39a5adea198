"""Structured Streaming tests: envelope unwrap semantics, schema
inference from sample, and an end-to-end foreachBatch upsert pipeline
(the reference's CDC path, SURVEY.md §3.2)."""

from __future__ import annotations

import json
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from automatic_etl_spark.streaming import cdc

PAYLOAD = StructType(
    [
        StructField("id", LongType(), True),
        StructField("nombre", StringType(), True),
    ]
)


def _env(op, before, after, ts_ms):
    return json.dumps(
        {"before": before, "after": after, "source": {"table": "t"}, "op": op, "ts_ms": ts_ms}
    )


def test_unwrap_envelope_delete_rewrite(spark):
    rows = [
        (_env("c", None, {"id": 1, "nombre": "a"}, 100),),
        (_env("u", {"id": 1, "nombre": "a"}, {"id": 1, "nombre": "b"}, 200),),
        (_env("d", {"id": 1, "nombre": "b"}, None, 300),),
        (_env("r", None, {"id": 2, "nombre": "x"}, 50),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = cdc.unwrap_envelope(cdc.parse_envelope(raw, PAYLOAD)).collect()
    by_op = {r["_op"]: r for r in out}
    assert by_op["d"]["__deleted"] is True
    assert by_op["d"]["nombre"] == "b"  # delete keeps the before-image
    assert by_op["u"]["__deleted"] is False and by_op["u"]["nombre"] == "b"
    assert by_op["r"]["id"] == 2


def test_cdc_last_writer_wins(spark):
    rows = [
        (_env("c", None, {"id": 1, "nombre": "v1"}, 100),),
        (_env("u", None, {"id": 1, "nombre": "v2"}, 200),),
        (_env("u", None, {"id": 2, "nombre": "w1"}, 150),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    unwrapped = cdc.unwrap_envelope(cdc.parse_envelope(raw, PAYLOAD))
    latest = cdc.cdc_microbatch_dedup(unwrapped, ["id"], [F.col("_ts_ms")])
    state = {r.id: r.nombre for r in latest.collect()}
    assert state == {1: "v2", 2: "w1"}


def test_payload_schema_from_sample(spark):
    schema = cdc.payload_schema_from_sample(
        spark, '{"id": 3000000000, "nombre": "x", "tamano": 2.5}'
    )
    fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert fields["id"] == "bigint"
    assert fields["nombre"] == "string"
    assert fields["tamano"] == "double"


def test_streaming_foreach_batch_upsert(spark, sf_dir):
    """events replayed as a file stream → unwrap-less upsert: latest
    row per user lands in the silver table (T4/T6 end to end)."""
    from automatic_etl_spark.plans.cdc_plans import stage_stream_dir
    from automatic_etl_spark.sources.parquet import table

    silver = tempfile.mkdtemp(prefix="silver_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        path = stage_stream_dir(spark, sf_dir, "events")
        raw_schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        query = (
            stream.writeStream.foreachBatch(
                cdc.foreach_batch_upsert(silver, ["user_id"], ["ts", "event_id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

        got = {
            r.user_id: r.event_id
            for r in spark.read.parquet(silver).collect()
        }
        from automatic_etl_spark.operators.dedup import latest_version

        expected = {
            r.user_id: r.event_id
            for r in latest_version(
                table(spark, sf_dir, "events"),
                ["user_id"],
                ["ts", "event_id"],
            ).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(silver, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_foreach_batch_upsert_partitioned_prunes(spark):
    import glob
    import os

    target = tempfile.mkdtemp(prefix="part_upsert_") + "/silver"
    base = spark.createDataFrame(
        [(1, "a1", 100, "2024-01"), (2, "b1", 100, "2024-02")],
        "id long, nombre string, _ts_ms long, month string",
    )
    apply_fn = cdc.foreach_batch_upsert_partitioned(
        target, keys=["id"], version_cols=["_ts_ms"], partition_col="month"
    )
    apply_fn(base, 0)

    jan_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/month=2024-01/*.parquet")
    }
    feb_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/month=2024-02/*.parquet")
    }
    assert jan_files and feb_files

    # second batch touches ONLY February
    batch2 = spark.createDataFrame(
        [(2, "b2", 200, "2024-02"), (3, "c1", 150, "2024-02")],
        "id long, nombre string, _ts_ms long, month string",
    )
    apply_fn(batch2, 1)

    state = {
        r["id"]: r["nombre"] for r in spark.read.parquet(target).collect()
    }
    assert state == {1: "a1", 2: "b2", 3: "c1"}  # LWW merge applied

    # January partition untouched: same files, same mtimes
    jan_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{target}/month=2024-01/*.parquet")
    }
    assert jan_after == jan_files
    # February was rewritten
    feb_after = set(glob.glob(f"{target}/month=2024-02/*.parquet"))
    assert feb_after != set(feb_files)


def test_stateful_queries_match_under_rocksdb_state_store(spark, sf_dir):
    """The RocksDB state store (what large-state production streams
    run — state spills to disk instead of living on the JVM heap) must
    produce byte-identical results to the default HDFS-backed store
    for our stateful streaming paths."""
    from automatic_etl_spark.plans.all_plans import REGISTRY

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key)
    for name in ("streaming_watermark_dedup", "streaming_hourly_counts"):
        fn = REGISTRY[name][0]
        baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
        try:
            spark.conf.set(key, rocks)
            with_rocks = sorted(map(tuple, fn(spark, sf_dir).collect()))
        finally:
            spark.conf.set(key, prev)
        assert with_rocks == baseline, name
