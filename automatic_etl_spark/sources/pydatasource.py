"""Custom Python DataSource (Spark 4, SPARK-44076) — the engine's
"write a connector in pure Python" extension point.

The reference generates JSON connector configs for an external
connect runtime (reference tools/gen_pipeline.py — the S15 surface
SURVEY §2.1 marks not-needed in a Spark-native design). Spark 4's
answer is better: a connector IS code — subclass ``DataSource``,
implement partition planning + a per-partition row iterator, register
it on the session, and every reader gets parallel scans, schema
enforcement, and options plumbing from the engine.

``SyntheticEventsDataSource`` is a deterministic generator connector:
rows derive from ``event_id`` by pure integer arithmetic (Lehmer-style
multiplicative hashes mod primes), so a SQL oracle can replay the
exact output — which is what makes the connector *testable*, not just
runnable. It doubles as the load-generator shape every pipeline wants
for soak tests.

Scale notes: ``partitions()`` is the parallelism contract — the
engine schedules one ``read()`` per partition across executors, so a
real connector (REST pages, S3 listings, Kafka offset ranges) maps
its natural sharding here; nothing flows through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Deterministic row derivation — mirrored verbatim in SQL oracles.
USER_MULT = 2654435761  # Knuth multiplicative hash constant
USER_MOD = 104729       # prime
CENTS_MULT = 48271      # Lehmer MINSTD multiplier
CENTS_MOD = 100000

FORMAT_NAME = "synthetic_events"
SCHEMA = "event_id long, user_id long, cents long"


def derive_row(event_id: int) -> tuple[int, int, int]:
    """The single source of truth for row content (pure-int, <2^63)."""
    return (
        event_id,
        (event_id * USER_MULT) % USER_MOD,
        (event_id * CENTS_MULT) % CENTS_MOD,
    )


class _Reader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # Strided assignment: partition i owns event_ids ≡ i (mod P).
        # Each executor generates its shard independently — no driver
        # involvement, no coordination.
        for event_id in range(partition.value, self.n_rows, self.n_parts):
            yield derive_row(event_id)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming contract in pure Python — the same
    shape a Kafka-like source exposes (monotone offsets, bounded
    per-batch reads, deterministic replay between committed offsets).
    This is the strongest in-sandbox stand-in for the waived live
    Kafka path: every micro-batch boundary, offset commit, and replay
    (``readBetweenOffsets`` — what recovery calls after a failure)
    executes for real.
    """

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("rows", 1000))
        self.step = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.step, self.total)
        return iter([derive_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay MUST reproduce the original rows exactly — rows are
        # pure functions of the offset range, so it does by
        # construction (tests pin it).
        return iter(
            [derive_row(i) for i in range(start["pos"], end["pos"])]
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", ...)``
    (batch) and ``spark.readStream.format(...)`` (offset-based
    micro-batch stream) over the same deterministic row universe."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _Reader:  # noqa: ANN001 — API signature
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:  # noqa: ANN001
        return _StreamReader(self.options)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent session registration of the connector."""
    spark.dataSource.register(SyntheticEventsDataSource)
