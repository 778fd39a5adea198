"""Parquet table access over the driver's TPC-H-ish fixture layout.

The reference's sources are MySQL tables discovered via metadata
(reference tools/ingest_runner.py:1795-1810); here the warehouse layout
is one parquet file/dir per table under a scale-factor directory
(TESTDATA.md). ``sources/jdbc.py`` carries the real JDBC source; this
module is the test/bench substrate.

All reads go through ``spark.read.parquet`` — Catalyst handles column
pruning and predicate pushdown into the scan, so callers should filter
and select early and never pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


# The fixtures carry parquet TIMESTAMP(NANOS) columns, which Spark's
# converter rejects outright. We read them as raw int64 nanos
# (legacy.parquet.nanosAsLong) and convert with exact integer division
# — the scan stays native/vectorized, and precision is preserved (a
# double division would lose precision above 2^53 ns).
_NANOS_TS_CACHE: dict[str, list[str]] = {}


def _nanos_ts_columns(path: str) -> list[str]:
    if path not in _NANOS_TS_CACHE:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        _NANOS_TS_CACHE[path] = [
            field.name
            for field in schema
            if pat.is_timestamp(field.type) and field.type.unit == "ns"
        ]
    return _NANOS_TS_CACHE[path]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table lazily (scan node only, no action)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        # Runtime SQL conf — set defensively so driver-created sessions
        # (which don't go through our builder) read these files too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Expose the fixture tables to Spark SQL as temp views."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
