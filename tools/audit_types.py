"""Audit type-family parity between every registry oracle and its Spark plan.

The driver's value-hash canonicalizes through Arrow/pandas, where DuckDB
HUGEINT (the result of SUM over integers) and DECIMAL columns render
differently from Spark's BIGINT/DOUBLE even when values are equal.
This script derives both schemas lazily (no query execution) and flags
any column whose canonical type family differs between the two engines.

Run: python tools/audit_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# canonical families
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "string", "BOOLEAN": "bool", "BLOB": "binary",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "DATE": "date", "TIME": "string", "INTERVAL": "interval",
}


def duck_family(t: str) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]") or s.startswith("STRUCT") or s.startswith("MAP"):
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
    if s == "date":
        return "date"
    if s.startswith(("array", "struct", "map")):
        return "nested"
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from automatic_etl_spark.plans.all_plans import REGISTRY
    from automatic_etl_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = 0
    for name, (fn, oracle) in REGISTRY.items():
        if oracle is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_types = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK BUILD ERROR: {e}")
            bad += 1
            continue
        try:
            rel = con.sql(oracle)
            d_types = dict(zip([c.lower() for c in rel.columns], [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCK PLAN ERROR: {e}")
            bad += 1
            continue
        for col in sorted(set(s_types) | set(d_types)):
            sf_ = spark_family(s_types.get(col, "<missing>"))
            df_ = duck_family(d_types.get(col, "<missing>"))
            if sf_ != df_:
                print(
                    f"{name}.{col}: spark={s_types.get(col)} ({sf_}) "
                    f"vs duck={d_types.get(col)} ({df_})"
                )
                bad += 1
    print(f"\n{'FAIL' if bad else 'OK'}: {bad} type-family mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
