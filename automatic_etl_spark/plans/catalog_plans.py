"""Catalog / set-operation plans (SURVEY.md §2.6 extension space +
§2.11): INTERSECT / EXCEPT, top-tables-by-size (O2), and the Q2
column profiler in long format."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators.profile import profile_columns
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table


# --- INTERSECT / EXCEPT (absent from the reference; free in Spark) ----------


@register(
    "set_ops",
    oracle="""
        WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        both_side AS (SELECT k FROM buyers INTERSECT SELECT k FROM rich),
        only_rich AS (SELECT k FROM rich EXCEPT SELECT k FROM buyers)
        SELECT 'intersect' AS op, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS key_total
        FROM both_side
        UNION ALL
        SELECT 'except' AS op, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS key_total
        FROM only_rich
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count("*").alias("cnt"),
            F.sum("k").alias("key_total"),
        )

    return summarize(buyers.intersect(rich), "intersect").unionByName(
        summarize(rich.exceptAll(buyers).distinct(), "except")
    )


# --- O2: top tables by size (catalog scan analog) ---------------------------
# (reference tools/pipeline_status.py:228 — ORDER BY total_rows DESC)


@register(
    "top_tables_by_size",
    oracle="""
        SELECT name, total_rows FROM (
            SELECT 'lineitem' AS name, COUNT(*) AS total_rows FROM lineitem
            UNION ALL SELECT 'orders', COUNT(*) FROM orders
            UNION ALL SELECT 'customer', COUNT(*) FROM customer
            UNION ALL SELECT 'part', COUNT(*) FROM part
            UNION ALL SELECT 'events', COUNT(*) FROM events
            UNION ALL SELECT 'documents', COUNT(*) FROM documents
        ) ORDER BY total_rows DESC, name ASC
    """,
)
def top_tables_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ("lineitem", "orders", "customer", "part", "events", "documents")
    counts = None
    for name in names:
        branch = table(spark, sf_dir, name).agg(
            F.lit(name).alias("name"), F.count("*").alias("total_rows")
        )
        counts = branch if counts is None else counts.unionByName(branch)
    return counts.orderBy(F.desc("total_rows"), F.asc("name"))


# --- Q2 long-format profile --------------------------------------------------


@register(
    "profile_customer",
    oracle="""
        SELECT 'c_custkey' AS "column",
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               COUNT(DISTINCT c_custkey) AS distinct_cnt,
               CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
               CAST(MAX(c_custkey) AS VARCHAR) AS max_value
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment',
               CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT c_mktsegment),
               CAST(MIN(c_mktsegment) AS VARCHAR),
               CAST(MAX(c_mktsegment) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_nationkey',
               CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT c_nationkey),
               CAST(MIN(c_nationkey) AS VARCHAR),
               CAST(MAX(c_nationkey) AS VARCHAR)
        FROM customer
    """,
)
def profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    return profile_columns(
        customer, ["c_custkey", "c_mktsegment", "c_nationkey"]
    )
