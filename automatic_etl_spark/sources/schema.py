"""Schema reflection + MySQL→Spark type mapping (SURVEY.md §1.2-§1.3,
operators S3/D5/D6).

The reference reflects MySQL metadata (DESCRIBE + information_schema +
PK probe; reference tools/ingest_runner.py:1130-1224,1420-1471) and
maps types through several overlapping MySQL→ClickHouse tables
(ingest_runner.py:1183-1214, gen_pipeline.py:194-206,
discover_mysql_tables.py:72-115). Here one authoritative map produces
Spark types, and reflection output is the engine-wide column-spec
shape consumed by cleaning (C*) and DDL (D1-D3).

Intentional divergences (SURVEY.md §7 risk register):
- decimal → DecimalType(18,6), NOT the reference's string-preservation
  hack (ingest_runner.py:1444) — Spark decimals are exact.
- tinyint(1) → BooleanType (the reference stores Int8).
"""

from __future__ import annotations

import re

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# NUMERIC / DEC / FIXED are exact-DECIMAL synonyms in MySQL — mapping
# them through double would silently lose exactness on money columns.
_DECIMAL_RE = re.compile(r"(?:decimal|numeric|dec|fixed)\s*\((\d+)\s*,\s*(\d+)\)")

# Authoritative MySQL→Spark map (§1.3 table).
_BASE_MAP: tuple[tuple[re.Pattern, DataType], ...] = tuple(
    (re.compile(pat), dtype)
    for pat, dtype in (
        (r"^tinyint\(1\)$|^bool(ean)?$", BooleanType()),
        (r"^tinyint", ByteType()),
        (r"^smallint", ShortType()),
        (r"^mediumint", IntegerType()),
        (r"^bigint", LongType()),
        (r"^int", IntegerType()),
        (r"^float", FloatType()),
        # MySQL REAL is DOUBLE PRECISION by default (REAL_AS_FLOAT off)
        (r"^(double|real)", DoubleType()),
        (r"^date$", DateType()),
        (r"^(datetime|timestamp)", TimestampType()),
        (r"^time$", StringType()),  # "HH:MM:SS" strings (C4)
        (r"^year", ShortType()),
        (r"^(char|varchar|.*text|enum|set)", StringType()),
        (r"^(.*blob|binary|varbinary)", StringType()),  # base64 wire form
        (r"^json", StringType()),
    )
)


def mysql_type_to_spark(mysql_type: str) -> DataType:
    t = mysql_type.strip().lower()
    m = _DECIMAL_RE.match(t)
    if m:
        precision, scale = int(m.group(1)), int(m.group(2))
        return DecimalType(min(precision, 38), scale)
    if t.startswith(("decimal", "numeric", "dec", "fixed")):
        return DecimalType(18, 6)  # reference default (ingest_runner.py:1198)
    for pattern, dtype in _BASE_MAP:
        if pattern.match(t):
            return dtype
    return StringType()  # fallback stringify (C19)


def cleaning_kind(mysql_type: str) -> str:
    """Column-spec 'kind' for functions.cleaning.clean_table."""
    t = mysql_type.strip().lower()
    if re.match(r"^tinyint\(1\)$|^bool", t):
        return "bool"
    if re.match(r"^(tinyint|smallint|mediumint|int|bigint|year)", t):
        return "integer"
    if re.match(r"^(float|real|double|numeric|decimal)", t):
        return "float"
    if re.match(r"^(date|datetime|timestamp)", t):
        return "temporal"
    if t == "time":
        return "time"
    return "string"


def reflect_to_struct(columns: list[dict]) -> StructType:
    """Reflection rows → StructType. Input rows are the engine-wide
    spec shape: {name, mysql_type, nullable, primary_key} — what the
    reference's DESCRIBE+PK probe emits (S3)."""
    fields = []
    for col in columns:
        nullable = bool(col.get("nullable", True)) and not col.get("primary_key")
        fields.append(
            StructField(col["name"], mysql_type_to_spark(col["mysql_type"]), nullable)
        )
    return StructType(fields)


def infer_numeric_types(df, columns: list[str] | None = None) -> dict[str, str]:
    """C16: auto type inference for untyped string columns — the
    reference probes with pd.to_numeric (all-integral → int, else
    float, else string; tools/ingest_runner.py:658-685). One aggregate
    pass instead of a pandas probe."""
    from pyspark.sql import functions as F

    cols = columns or [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    if not cols:
        return {}
    aggs = []
    for c in cols:
        d = F.col(c).try_cast("double")
        aggs.extend(
            [
                F.count(F.col(c)).alias(f"{c}__n"),
                F.count(d).alias(f"{c}__numeric"),
                F.count(F.when(d == F.floor(d), 1)).alias(f"{c}__integral"),
            ]
        )
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        n, numeric, integral = row[f"{c}__n"], row[f"{c}__numeric"], row[f"{c}__integral"]
        if n == 0 or numeric < n:
            out[c] = "string"
        elif integral == n:
            out[c] = "long"
        else:
            out[c] = "double"
    return out


def clean_specs_from_columns(columns: list[dict]) -> dict[str, dict]:
    """Reflection rows → clean_table specs (the §3.1 pipeline glue)."""
    return {
        col["name"]: {
            "kind": cleaning_kind(col["mysql_type"]),
            "nullable": bool(col.get("nullable", True)),
            "pk": bool(col.get("primary_key", False)),
        }
        for col in columns
    }
