"""Per-table JSON-Schema (draft-07) contract emission (SURVEY.md §2.8).

The reference emits one draft-07 schema per ingested table so
downstream consumers can validate payloads without a DB connection
(reference tools/gen_pipeline.py:83-111: ``json_type`` maps the
engine's column types onto {integer, number, string, object} and
``write_json_schema`` renders properties + required). Here the source
of truth is the Spark ``StructType`` instead of an information_schema
scan — same contract artifact, derived from the catalog the engine
actually executes against.

Mapping parity with the reference's ``json_type``:
- integral types → ``integer``
- decimal / float / double → ``number``
- date / timestamp → ``string`` (serialized form, as the reference)
- string / binary → ``string``
- struct / map → ``object``
- array<T> → ``array`` with typed ``items`` (no MySQL analogue; the
  Spark-native extension keeps nested data contractable)

``required`` lists non-nullable fields — the reference additionally
exempts auto_increment/defaulted columns, metadata Spark schemas do
not carry; pass ``optional`` to exempt such columns explicitly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

DRAFT_07 = "http://json-schema.org/draft-07/schema#"

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMBER = (T.FloatType, T.DoubleType, T.DecimalType)
_STRINGISH = (
    T.StringType,
    T.BinaryType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.CharType,
    T.VarcharType,
)


def json_type(dtype: T.DataType) -> dict:
    """Spark DataType → draft-07 property spec (reference
    tools/gen_pipeline.py:83-95 semantics)."""
    if isinstance(dtype, _INTEGRAL):
        return {"type": "integer"}
    if isinstance(dtype, _NUMBER):
        return {"type": "number"}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, _STRINGISH):
        return {"type": "string"}
    if isinstance(dtype, T.ArrayType):
        return {"type": "array", "items": json_type(dtype.elementType)}
    if isinstance(dtype, (T.StructType, T.MapType)):
        return {"type": "object"}
    return {"type": "string"}


def struct_to_json_schema(
    schema: T.StructType,
    title: str,
    optional: set[str] | None = None,
) -> dict:
    """Render a StructType as the reference's per-table draft-07
    contract object (tools/gen_pipeline.py:97-109)."""
    optional = optional or set()
    props = {f.name: json_type(f.dataType) for f in schema.fields}
    required = [
        f.name
        for f in schema.fields
        if not f.nullable and f.name not in optional
    ]
    return {
        "$schema": DRAFT_07,
        "title": title,
        "type": "object",
        "properties": props,
        "required": required,
    }


def write_table_contract(
    schema: T.StructType,
    database: str,
    table: str,
    out_dir: str,
    optional: set[str] | None = None,
) -> str:
    """Write ``{database}.{table}.schema.json`` (same artifact naming
    as tools/gen_pipeline.py:110-111); returns the path."""
    obj = struct_to_json_schema(schema, f"{database}.{table}", optional)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{database}.{table}.schema.json")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(obj, indent=2, ensure_ascii=False))
    return path


def write_contracts_for_dir(
    spark, sf_dir: str, database: str, out_dir: str
) -> list[str]:
    """Emit one contract per parquet table in ``sf_dir`` — the batch
    analogue of the reference's per-connector schema dump."""
    from automatic_etl_spark.sources.parquet import TABLES, table

    return [
        write_table_contract(
            table(spark, sf_dir, name).schema, database, name, out_dir
        )
        for name in TABLES
    ]
