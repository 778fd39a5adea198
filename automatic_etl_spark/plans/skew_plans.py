"""Oracle-checked plans for the skew-salting operators.

``event_type`` has ~5 distinct values over the whole events table —
exactly the hot-key shape where an unsalted shuffle concentrates each
key on one reducer. The oracles run the PLAIN join/agg SQL: salting
must be result-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators import skew
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table

EVENT_WEIGHTS = (
    ("click", 1),
    ("view", 2),
    ("signup", 5),
    ("purchase", 10),
    ("error", 0),
)

_SQL_WEIGHTS = ", ".join(f"('{t}', {w})" for t, w in EVENT_WEIGHTS)


@register(
    "skew_salted_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS cnt,
               (CAST(SUM(CAST(floor((value) * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4) AS total_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").withColumn(
        "value_units",
        F.floor(F.col("value") * F.lit(1e4) + F.lit(0.5)).cast("long"),
    )
    out = skew.salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "cnt": ("count", "*"),
            "total_value": ("sum", "value_units"),
            "max_value": ("max", "value"),
        },
        buckets=16,
    )
    return out.withColumn(
        "total_value", F.col("total_value").cast("double") / F.lit(1e4)
    )


@register(
    "skew_salted_join",
    oracle=f"""
        SELECT e.event_type,
               COUNT(*) AS cnt,
               (CAST(SUM(CAST(floor((e.value * w.weight) * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4)
                   AS weighted_value
        FROM events e
        JOIN (VALUES {_SQL_WEIGHTS}) AS w(event_type, weight)
          ON e.event_type = w.event_type
        GROUP BY e.event_type
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # shuffle_hash hint models the cluster case where dim × buckets is
    # past the broadcast threshold — the shape salting exists for.
    dim = spark.createDataFrame(
        list(EVENT_WEIGHTS), "event_type string, weight int"
    ).hint("shuffle_hash")
    joined = skew.salted_join(events, dim, "event_type", buckets=8)
    units = F.floor(
        (F.col("value") * F.col("weight")) * F.lit(1e4) + F.lit(0.5)
    ).cast("long")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        (F.sum(units).cast("double") / F.lit(1e4)).alias("weighted_value"),
    )
