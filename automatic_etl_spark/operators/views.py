"""Analytics-view projection layer (SURVEY.md §2.2 P1-P5, §2.8 D9).

The reference auto-generates a ``{db}_analytics.{table}_v`` view per
table that passes all base columns through and appends ``*_date``
helper columns: ``toDate(c)`` for DateTime columns and a best-effort
multiIf parse (with a DD-MM-YYYY fallback) for String columns whose
NAME matches the date regex (reference
tools/generate_analytics_views.py:83-143).

Spark-first: one ``select`` projection per view; the ClickHouse
function surface maps 1:1 (``parseDateTimeBestEffortOrNull`` →
guarded ``try_to_timestamp`` chain, ``multiIf`` → ``when`` chain).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

# P5: name-based detection of string date columns
# (generate_analytics_views.py:83,127).
DATE_NAME_PATTERN = re.compile(r"^fecha$|^fecha_.*|.*_fecha$")


def best_effort_date(c: Column | str) -> Column:
    """P4: ISO parse guarded by shape+year, else DD-MM-YYYY fallback,
    else NULL (generate_analytics_views.py:100-111 structure)."""
    s = F.col(c) if isinstance(c, str) else c
    is_ymd = s.rlike(r"^\d{4}-\d{2}-\d{2}") & F.substring(s, 1, 4).between(
        "1901", "2099"
    )
    is_dmy = (F.length(s) >= 10) & (F.substring(s, 3, 1) == "-")
    ymd = F.try_to_timestamp(F.substring(s, 1, 10)).cast("date")
    dmy = F.try_to_timestamp(
        F.concat_ws(
            "-",
            F.substring(s, 7, 4),
            F.substring(s, 4, 2),
            F.substring(s, 1, 2),
        )
    ).cast("date")
    return F.when(is_ymd, ymd).when(is_dmy, dmy)


def analytics_projection(df: DataFrame) -> DataFrame:
    """P1 passthrough + date-helper columns:

    - Timestamp column ``c`` → ``{c}_date = to_date(c)``   (P2)
    - Date column ``c``      → ``{c}_date = c``            (P3)
    - String column named like a date → best-effort parse  (P4+P5)
    """
    cols: list[Column] = [F.col(name) for name in df.columns]
    existing = set(df.columns)
    for field in df.schema.fields:
        alias = f"{field.name}_date"
        if alias in existing:
            # a previously-materialized view already carries the
            # helper column — emitting a second one would make every
            # reference to it AMBIGUOUS and writers reject the schema
            continue
        if isinstance(field.dataType, (TimestampType, TimestampNTZType)):
            cols.append(F.to_date(F.col(field.name)).alias(alias))
        elif isinstance(field.dataType, DateType):
            cols.append(F.col(field.name).alias(alias))
        elif field.dataType.simpleString() == "string" and DATE_NAME_PATTERN.match(
            field.name
        ):
            cols.append(best_effort_date(field.name).alias(alias))
    return df.select(*cols)


def create_analytics_view(df: DataFrame, view_name: str) -> DataFrame:
    """D9: register the projection as ``{view_name}_v``."""
    projected = analytics_projection(df)
    projected.createOrReplaceTempView(f"{view_name}_v")
    return projected


def create_analytics_views(
    spark, tables: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Batch view build over a catalog of tables (the reference loops
    every non-``_v`` table; generate_analytics_views.py:146-176)."""
    return {
        name: create_analytics_view(df, name)
        for name, df in tables.items()
        if not name.endswith("_v")
    }
