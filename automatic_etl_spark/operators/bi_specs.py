"""BI auto-registration spec emission (SURVEY.md §2.1 S15-adjacent).

The reference bootstraps its BI layer over HTTP: Superset datasets get
registered with every DATE/TIME/TIMESTAMP column flagged ``is_dttm``
and a default ``main_dttm_col`` (superset_bootstrap/
configure_datasets.py:324-433), and Metabase gets a working card set —
a scalar COUNT card and a recent-rows table card per table plus one
UNION-ALL summary card (tools/create_working_metabase_questions.py:
77-121). The computation side of those cards is already covered by the
query registry; this module ports the SPEC side as plain JSON
artifacts derived from the Spark catalog — apply them with any HTTP
client; the engine stays connection-free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


def _sql_type(dtype: T.DataType) -> str:
    return dtype.simpleString().upper()


def time_column(schema: T.StructType) -> str | None:
    """Default temporal column: the first DATE/TIMESTAMP field, the
    same auto-detection the reference applies when SUPERSET_TIME_COLUMN
    is unset."""
    for f in schema.fields:
        if isinstance(f.dataType, _TEMPORAL):
            return f.name
    return None


def superset_dataset_spec(
    schema: T.StructType, database: str, table: str
) -> dict:
    """One dataset registration payload: columns typed from the Spark
    schema, temporal columns pre-flagged ``is_dttm`` (the GROUP BY
    pitfall the reference's mark_datetime_columns exists to fix), and
    ``main_dttm_col`` defaulted to the first temporal column."""
    cols = [
        {
            "column_name": f.name,
            "type": _sql_type(f.dataType),
            "is_dttm": isinstance(f.dataType, _TEMPORAL),
        }
        for f in schema.fields
    ]
    return {
        "table_name": table,
        "schema": database,
        "columns": cols,
        "main_dttm_col": time_column(schema),
    }


def metabase_cards_for_table(
    schema: T.StructType, database: str, table: str, preview_limit: int = 10
) -> list[dict]:
    """The reference's per-table working-card pair: a scalar COUNT and
    a recent-rows preview (time-ordered when a temporal column exists,
    mirroring the 'Últimos …' cards)."""
    fq = f"{database}.{table}"
    cards = [
        {
            "name": f"Total {table}",
            "sql": f"SELECT COUNT(*) AS total_{table} FROM {fq}",
            "display": "scalar",
        }
    ]
    tcol = time_column(schema)
    cols = ", ".join(f.name for f in schema.fields[:6])
    order = f" ORDER BY {tcol} DESC" if tcol else ""
    cards.append(
        {
            "name": f"Recent {table}",
            "sql": f"SELECT {cols} FROM {fq}{order} LIMIT {preview_limit}",
            "display": "table",
        }
    )
    return cards


def summary_card(database: str, tables: list[str]) -> dict:
    """The UNION-ALL category rollup card
    (create_working_metabase_questions.py:103-120)."""
    branches = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS categoria, COUNT(*) AS total_registros "
        f"FROM {database}.{t}"
        for t in tables
    )
    return {"name": "Resumen General", "sql": branches, "display": "table"}


def emit_bi_specs(spark, sf_dir: str, database: str, out_dir: str) -> dict:
    """Write ``superset_datasets.json`` + ``metabase_cards.json`` for
    every fixture table; returns the parsed artifacts."""
    from automatic_etl_spark.sources.parquet import TABLES, table

    datasets, cards = [], []
    names = list(TABLES)
    for name in names:
        schema = table(spark, sf_dir, name).schema
        datasets.append(superset_dataset_spec(schema, database, name))
        cards.extend(metabase_cards_for_table(schema, database, name))
    cards.append(summary_card(database, names))

    os.makedirs(out_dir, exist_ok=True)
    out = {"superset_datasets.json": datasets, "metabase_cards.json": cards}
    for fname, obj in out.items():
        with open(os.path.join(out_dir, fname), "w", encoding="utf-8") as fh:
            fh.write(json.dumps(obj, indent=2, ensure_ascii=False))
    return out
