"""Oracle-checked plan for the count-min sketch: heavy hitters get
exact counts AND sketch estimates; both engines build the identical
sketch from the same md5-derived buckets, so even the estimates match
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators import sketch as sk
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table

TOP = 10


def _sql_hex_val(digit: str) -> str:
    return (
        f"CASE WHEN {digit} BETWEEN '0' AND '9' THEN ascii({digit}) - 48 "
        f"ELSE ascii({digit}) - 87 END"
    )


def _sql_bucket(key_expr: str, row: int) -> str:
    h = f"md5('{row}|' || CAST({key_expr} AS VARCHAR))"
    return (
        f"({_sql_hex_val(f'substr({h}, 1, 1)')}) * 16"
        f" + ({_sql_hex_val(f'substr({h}, 2, 1)')})"
    )


def _sql_oracle() -> str:
    row_ctes = ",\n".join(
        f"b{k} AS (SELECT {_sql_bucket('user_id', k)} AS bucket,"
        f" COUNT(*) AS cnt FROM events GROUP BY 1)"
        for k in range(sk.DEPTH)
    )
    joins = "\n".join(
        f"LEFT JOIN b{k} ON b{k}.bucket = {_sql_bucket('t.user_id', k)}"
        for k in range(sk.DEPTH)
    )
    least = ", ".join(f"coalesce(b{k}.cnt, 0)" for k in range(sk.DEPTH))
    return f"""
        WITH top AS (
            SELECT user_id, COUNT(*) AS true_cnt FROM events
            GROUP BY user_id ORDER BY true_cnt DESC, user_id ASC LIMIT {TOP}
        ),
        {row_ctes}
        SELECT t.user_id, t.true_cnt, least({least}) AS est_cnt
        FROM top t
        {joins}
    """


@register("countmin_heavy_hitters", oracle=_sql_oracle())
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-N users vs their count-min estimates (est >= true by
    the CMS guarantee; equality whenever no bucket collision)."""
    events = table(spark, sf_dir, "events")
    cms = sk.build_sketch(events, "user_id")
    top = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(TOP)
    )
    est = sk.estimate_counts(cms, top.select("user_id"), "user_id")
    return top.join(est, "user_id").select("user_id", "true_cnt", "est_cnt")
