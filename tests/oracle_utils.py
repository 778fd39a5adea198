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
