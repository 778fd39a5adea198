"""Oracle-checked plan for the multimodal binary-column pipeline.

The Spark side runs REAL mapInPandas over binary payloads; the decode
step is a deterministic md5-derived fake (codecs aren't in this
container — operators/multimodal.py), which is exactly why the oracle
can mirror it in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators.multimodal import (
    extract_features,
    make_blob_table,
)
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table


def _sql_hexval(digit: str) -> str:
    return (
        f"CASE WHEN {digit} BETWEEN '0' AND '9' THEN ascii({digit}) - 48 "
        f"ELSE ascii({digit}) - 87 END"
    )


@register(
    "multimodal_features",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   'txt' AS fmt,
                   octet_length(encode(text)) AS n_bytes,
                   64 + {_sql_hexval("substr(md5(text), 1, 1)")} * 8 AS fake_width,
                   64 + {_sql_hexval("substr(md5(text), 2, 1)")} * 8 AS fake_height,
                   md5(text) AS payload_md5
            FROM documents
        )
        SELECT fmt,
               COUNT(*) AS cnt,
               SUM(n_bytes) AS bytes_total,
               SUM(fake_width) AS width_total,
               SUM(fake_height) AS height_total,
               COUNT(DISTINCT payload_md5) AS distinct_payloads
        FROM feats GROUP BY fmt
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    feats = extract_features(make_blob_table(docs))
    return feats.groupBy("fmt").agg(
        F.count("*").alias("cnt"),
        F.sum("n_bytes").alias("bytes_total"),
        F.sum("fake_width").alias("width_total"),
        F.sum("fake_height").alias("height_total"),
        F.countDistinct("payload_md5").alias("distinct_payloads"),
    )
