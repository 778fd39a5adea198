"""Oracle-checked plans for the analytics-view layer (P1-P5, D9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators.views import analytics_projection
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table

_SQL_FECHA = """
    CASE o_orderkey % 4
      WHEN 0 THEN strftime(o_orderdate, '%d-%m-%Y')
      WHEN 1 THEN '0000-00-00'
      WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
      ELSE 'not a date'
    END
"""

_SQL_BEST_EFFORT = """
    CASE WHEN regexp_matches(fecha, '^\\d{4}-\\d{2}-\\d{2}')
              AND substr(fecha, 1, 4) BETWEEN '1901' AND '2099'
         THEN TRY_CAST(substr(fecha, 1, 10) AS DATE)
         WHEN length(fecha) >= 10 AND substr(fecha, 3, 1) = '-'
         THEN TRY_CAST(substr(fecha, 7, 4) || '-' || substr(fecha, 4, 2)
                       || '-' || substr(fecha, 1, 2) AS DATE)
    END
"""


@register(
    "analytics_view_dates",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey, o_orderdate, {_SQL_FECHA} AS fecha FROM orders
        ),
        view_v AS (
            SELECT *, CAST(o_orderdate AS DATE) AS o_orderdate_date,
                   {_SQL_BEST_EFFORT} AS fecha_date
            FROM base
        )
        SELECT year(o_orderdate_date) AS y, month(o_orderdate_date) AS m,
               COUNT(*) AS cnt,
               CAST(SUM(CASE WHEN fecha_date IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS fecha_nulls,
               CAST(SUM(CASE WHEN fecha_date IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS fecha_valid,
               MIN(fecha_date) AS min_fecha,
               MAX(fecha_date) AS max_fecha
        FROM view_v GROUP BY 1, 2
    """,
)
def analytics_view_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 timestamp helper + P4/P5 best-effort string date (with the
    DD-MM-YYYY fallback branch exercised) through the real view
    generator."""
    orders = table(spark, sf_dir, "orders", fan_out=False)
    k = F.col("o_orderkey") % 4
    base = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.when(k == 0, F.date_format("o_orderdate", "dd-MM-yyyy"))
        .when(k == 1, F.lit("0000-00-00"))
        .when(k == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.lit("not a date"))
        .alias("fecha"),  # name triggers the P5 regex
    )
    view = analytics_projection(base)
    return (
        view.groupBy(
            F.year("o_orderdate_date").alias("y"),
            F.month("o_orderdate_date").alias("m"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("fecha_date").isNull().cast("int")).alias("fecha_nulls"),
            F.sum(F.col("fecha_date").isNotNull().cast("int")).alias("fecha_valid"),
            F.min("fecha_date").alias("min_fecha"),
            F.max("fecha_date").alias("max_fecha"),
        )
    )
