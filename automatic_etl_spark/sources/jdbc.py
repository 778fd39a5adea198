"""JDBC source layer (SURVEY.md §2.1 S1-S3, S5-S6).

The reference reads MySQL with pandas in 50k-row chunks over PyMySQL
(reference tools/ingest_runner.py:1474-1523). Spark-first: a
partitioned ``spark.read.jdbc`` — chunking becomes
``partitionColumn/lowerBound/upperBound/numPartitions`` so executors
read in parallel and predicates push into the database.

No database exists in the test environment, so everything here is
exercised through option-building unit tests; the parquet fixtures
stand in for MySQL tables everywhere else (TESTDATA.md).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SYSTEM_SCHEMAS = ("mysql", "information_schema", "performance_schema", "sys")


@dataclass
class JdbcSource:
    """Connection spec — the engine analog of DB_CONNECTIONS JSON
    (reference tools/ingest_runner.py:54-110)."""

    url: str  # jdbc:mysql://host:3306/db
    user: str = ""
    password: str = ""
    driver: str = "com.mysql.cj.jdbc.Driver"
    fetchsize: int = 50_000  # reference CHUNKSIZE parity

    def base_options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
        }


def scan_options(
    source: JdbcSource,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    limit: int | None = None,
) -> dict[str, str]:
    """S1 chunked scan options. With a numeric PK the read fans out to
    ``num_partitions`` parallel range queries; ``limit`` reproduces the
    reference's --limit (S4) via pushed-down subquery."""
    if limit is not None and partition_column is not None:
        # Each of the N range queries would re-execute the unordered
        # LIMIT subquery independently — the server may return a
        # DIFFERENT n-row subset per range, so the union duplicates
        # and drops rows nondeterministically. Apply .limit() on the
        # DataFrame after a partitioned read instead.
        raise ValueError(
            "scan_options: limit cannot be combined with "
            "partition_column (per-partition LIMIT subqueries are "
            "nondeterministic); limit the DataFrame after the read"
        )
    if partition_column is not None and (
        lower_bound is None or upper_bound is None
    ):
        # Defaulting bounds to (0, 1) silently clamps numPartitions to
        # upperBound-lowerBound = 1 — the whole table through one
        # executor, defeating the fan-out this module exists for.
        raise ValueError(
            "scan_options: partition_column requires explicit "
            "lower_bound and upper_bound (probe MIN/MAX of the key "
            "first); implicit (0, 1) bounds serialize the scan"
        )
    opts = source.base_options()
    if limit is not None:
        opts["dbtable"] = f"(SELECT * FROM {table} LIMIT {limit}) AS t"
    else:
        opts["dbtable"] = table
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_table(spark: SparkSession, source: JdbcSource, table: str, **kwargs) -> DataFrame:
    reader = spark.read.format("jdbc")
    for key, value in scan_options(source, table, **kwargs).items():
        reader = reader.option(key, value)
    return reader.load()


def write_options(
    source: JdbcSource,
    table: str,
    batchsize: int = 50_000,
    truncate: bool = False,
    isolation_level: str = "READ_COMMITTED",
) -> dict[str, str]:
    """S11/S12 sink options: ``batchsize`` mirrors the reference's
    50k-row insert chunks (tools/ingest_runner.py:2054); ``truncate``
    with mode('overwrite') reproduces TRUNCATE-before-load (S12,
    :1722-1727) without dropping the table DDL."""
    opts = source.base_options()
    opts.pop("fetchsize", None)
    opts.update(
        dbtable=table,
        batchsize=str(batchsize),
        isolationLevel=isolation_level,
        truncate=str(truncate).lower(),
    )
    return opts


def write_table(
    df: DataFrame,
    source: JdbcSource,
    table: str,
    mode: str = "append",
    **kwargs,
) -> None:
    writer = df.write.format("jdbc").mode(mode)
    for key, value in write_options(source, table, **kwargs).items():
        writer = writer.option(key, value)
    writer.save()


def discovery_query(schema_filter: str | None = None) -> str:
    """S2 table discovery: BASE TABLEs from information_schema
    (reference tools/gen_pipeline.py:43-56)."""
    where = "table_type = 'BASE TABLE'"
    if schema_filter:
        where += f" AND table_schema = '{schema_filter}'"
    return (
        "(SELECT table_schema, table_name FROM information_schema.tables "
        f"WHERE {where}) AS t"
    )


def reflection_query(schema: str, table: str) -> str:
    """S3 column reflection: information_schema.columns
    (reference tools/gen_pipeline.py:58-81)."""
    return (
        "(SELECT column_name AS name, column_type AS mysql_type, "
        "is_nullable = 'YES' AS nullable, column_key = 'PRI' AS primary_key "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position) AS c"
    )


def filter_tables(
    tables: list[tuple[str, str]],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    allow_system_schemas: bool = False,
) -> list[tuple[str, str]]:
    """S5 include/exclude + S6 system-schema guard. Matches
    ``schema.table`` or bare ``table`` names, like the reference
    (tools/ingest_runner.py:2164-2188)."""

    def matches(spec: str, schema: str, table: str) -> bool:
        return spec in (f"{schema}.{table}", table)

    out = []
    for schema, table in tables:
        if not allow_system_schemas and schema.lower() in SYSTEM_SCHEMAS:
            continue
        if include and not any(matches(s, schema, table) for s in include):
            continue
        if exclude and any(matches(s, schema, table) for s in exclude):
            continue
        out.append((schema, table))
    return out
