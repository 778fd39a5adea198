"""Local mirror of the driver's Spark-vs-DuckDB comparison.

The driver sorts columns by name and hashes values order-insensitively
(CORRECTNESS contract in __spark_entry__.py). This harness is at least
as strict: canonical per-cell strings, rows sorted, exact equality —
so anything passing here should pass the driver.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

# --- type-family parity ------------------------------------------------------
# The driver's value-hash canonicalizes through Arrow/pandas, where
# DuckDB HUGEINT (SUM over integers) surfaces as float64/decimal128 and
# hashes differently from Spark's BIGINT even when values are equal.
# fetchall() masks this (both become Python int), so compare() also
# requires each column's canonical type FAMILY to match across engines.

_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "string", "BOOLEAN": "bool", "BLOB": "binary",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "DATE": "date",
}


def duck_family(t: str) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]") or s.startswith(("STRUCT", "MAP")):
        return "nested"
    return _DUCK_FAMILY.get(s, s.lower())


def spark_family(t: str) -> str:
    s = t.lower()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("string", "varchar"):
        return "string"
    if s == "boolean":
        return "bool"
    if s == "binary":
        return "binary"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith(("array", "struct", "map")):
        return "nested"
    return s


def canon_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr() is the shortest round-trip form — identical doubles
        # canonicalize identically.
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_cell(row[i]) for i in order) for row in rows)


def compare(
    spark_df, duck_con, oracle_sql: str
) -> tuple[bool, str]:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    rel = duck_con.sql(oracle_sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(
        c.lower() for c in duck_cols
    ):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"

    s_types = {
        f.name.lower(): spark_family(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    d_types = dict(
        zip((c.lower() for c in rel.columns), (duck_family(t) for t in rel.types))
    )
    type_diffs = [
        f"{c}: spark={s_types[c]} duck={d_types[c]}"
        for c in s_types
        if s_types[c] != d_types.get(c, s_types[c])
    ]
    if type_diffs:
        return False, "type-family mismatch: " + "; ".join(type_diffs)
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"

    s = canon_rows([c.lower() for c in spark_cols], [tuple(r) for r in spark_rows])
    d = canon_rows([c.lower() for c in duck_cols], duck_rows)
    if s != d:
        diffs = [
            f"  spark={a}\n  duck ={b}" for a, b in zip(s, d) if a != b
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
