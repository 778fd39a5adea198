"""Kafka streaming source builders (SURVEY.md §2.1 S7-S8, §2.9).

The reference consumes Debezium topics two ways: a ClickHouse
Kafka-engine table with ``kafka_format='JSONAsString'`` (reference
tools/gen_pipeline.py:290-293) and a Python consumer with
``auto_offset_reset=earliest`` + topic-pattern matching
(tools/kafka_to_clickhouse.py:19-27,137-163). Both map to ONE Spark
construct: ``readStream.format("kafka")`` with ``subscribePattern``
and ``startingOffsets=earliest``, value cast to string.

The Kafka connector jar isn't in this container, so tests exercise the
option-building only; the file-source path in plans/cdc_plans.py is
the runnable stand-in (same downstream plan from the value column on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def topic_pattern(prefix: str, connection: str) -> str:
    """Debezium topic naming: ``{prefix}_{conn}.{schema}.{table}``
    (reference tools/gen_pipeline.py:190,286) → subscribe regex.
    Prefix/connection are regex-ESCAPED: connector names routinely
    carry dots/dashes ("prod.primary"), and an unescaped dot would
    subscribe to unintended topics ("prod_primary" vs "prodXprimary")."""
    import re as _re

    return f"{_re.escape(prefix)}_{_re.escape(connection)}\\..*"


def stream_options(
    brokers: str,
    pattern: str,
    starting_offsets: str = "earliest",  # snapshot-then-stream (T2)
    max_offsets_per_trigger: int | None = None,  # backpressure (T7)
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribePattern": pattern,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",  # at-least-once parity (T1)
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_stream(spark: SparkSession, brokers: str, pattern: str, **kwargs) -> DataFrame:
    """S7/S8: the JSONAsString shape — (topic, ingestable value)."""
    reader = spark.readStream.format("kafka")
    for key, value in stream_options(brokers, pattern, **kwargs).items():
        reader = reader.option(key, value)
    df = reader.load()
    return df.selectExpr("topic", "CAST(value AS STRING) AS value")


def producer_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """S13 test-producer analog: key=id, value=JSON of the row —
    callers pair this with
    ``df.selectExpr("CAST(id AS STRING) key", "to_json(struct(*)) value")``."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}
