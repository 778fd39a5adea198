"""Oracle-checked plan for the end-to-end batch ingest pipeline
(SURVEY.md §3.1): scan → clean → window dedup → atomic overwrite write
→ read-back → count reconciliation. The oracle predicts the audit
report directly from the source."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from automatic_etl_spark.ingest import IngestSpec, ingest_table
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table


@register(
    "ingest_e2e",
    oracle="""
        WITH src AS (
            SELECT event_type, COUNT(*) AS src_cnt FROM events GROUP BY 1
        ),
        snk AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS snk_cnt
            FROM events GROUP BY 1
        )
        SELECT src.event_type,
               src_cnt,
               snk_cnt,
               src_cnt - snk_cnt AS diff,
               CASE WHEN src_cnt = snk_cnt THEN 'OK' ELSE 'MISMATCH' END
                   AS verdict
        FROM src JOIN snk USING (event_type)
    """,
)
def ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest `events` as a versioned entity table: latest row per
    (user_id, event_type); the audit reports dedup shrinkage per type
    (sink count == distinct users per type)."""
    events = table(spark, sf_dir, "events")
    target = tempfile.mkdtemp(prefix="ingest_e2e_") + "/events_silver"
    spec = IngestSpec(
        dedup_keys=("user_id", "event_type"),
        version_cols=("ts",),
        tiebreaker=("event_id",),
        audit_key="event_type",
    )
    return ingest_table(spark, events, target, spec)
