"""File-format sources beyond parquet (CSV / JSON lines).

The reference reads only MySQL (batch) and Kafka JSON (CDC) — no file
readers exist there (SURVEY.md §2.1 note). A standalone engine needs
them anyway: CSV/JSON are the interchange formats every ETL user
brings. Both readers take an EXPLICIT schema by default — schema
inference re-reads the input and guesses types (the exact failure mode
the reference's type-mapping machinery exists to avoid, SURVEY §1.3).

Scale notes: CSV/JSON scans split by line across tasks like any text
source; column pruning applies to JSON via the provided schema,
predicate pushdown does not (text formats have no statistics) — land
into parquet/Delta early, which is what plans/ingest_plans.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CSV_DEFAULTS = {
    "header": "true",
    "nullValue": "",
    "emptyValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "mode": "PERMISSIVE",  # bad rows → nulls, reference-style tolerance
}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    opts = {**CSV_DEFAULTS, **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, **options: str) -> None:
    opts = {**CSV_DEFAULTS, **options}
    df.write.mode("overwrite").options(**opts).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    row_tag: str = "row",
    **options: str,
) -> DataFrame:
    """Native XML source (built into Spark 4, SPARK-44265). Same
    explicit-schema discipline as CSV/JSON — XML inference is a
    second full pass AND a type guess."""
    reader = spark.read.options(rowTag=row_tag, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("xml").load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", **options: str
) -> None:
    df.write.mode("overwrite").options(rowTag=row_tag, **options).format(
        "xml"
    ).save(path)


def read_text(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Line-oriented text source — one row per line, column ``value``.
    The raw-corpus ingestion path (one document per line)."""
    return spark.read.options(**options).text(path)


def write_text(df: DataFrame, path: str, **options: str) -> None:
    """df must be a single string column; rows must not contain
    newlines (the format has no escaping)."""
    df.write.mode("overwrite").options(**options).text(path)
