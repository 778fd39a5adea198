"""Audit / reconciliation operators (SURVEY.md §2.11).

The reference's primary correctness check is per-table row-count
reconciliation between source (MySQL) and sink (ClickHouse), computed
in a Python loop over per-table COUNT(*) queries (reference
tools/ingest_runner.py:1813-1937; tools/audit_mysql_clickhouse.py:38-80).

Spark-first: both sides are grouped counts joined full-outer on the
audit key — a distributed plan instead of a driver loop, so the same
code audits 10 tables or 10,000 partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_counts(
    source: DataFrame,
    sink: DataFrame,
    key: str,
    key_alias: str = "key",
) -> DataFrame:
    """Per-key source vs sink row counts with diff + verdict.

    Output columns: ``{key_alias}, src_cnt, snk_cnt, diff, verdict`` —
    the shape of the reference's audit report rows
    (tools/ingest_runner.py:1853-1932).
    """
    src = source.groupBy(F.col(key).alias(key_alias)).agg(
        F.count("*").alias("src_cnt")
    )
    snk = sink.groupBy(F.col(key).alias("__snk_key")).agg(
        F.count("*").alias("snk_cnt")
    )
    src_cnt = F.coalesce(F.col("src_cnt"), F.lit(0))
    snk_cnt = F.coalesce(F.col("snk_cnt"), F.lit(0))
    # NULL-SAFE key pairing: a plain equi-join never matches NULL=NULL,
    # so a NULL audit key that reconciles perfectly would surface as
    # TWO MISMATCH rows (src-only and snk-only) and flip grand_total.
    return (
        src.join(
            snk,
            F.col(key_alias).eqNullSafe(F.col("__snk_key")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col(key_alias), F.col("__snk_key")).alias(key_alias),
            src_cnt.alias("src_cnt"),
            snk_cnt.alias("snk_cnt"),
            (src_cnt - snk_cnt).alias("diff"),
            F.when(src_cnt == snk_cnt, F.lit("OK"))
            .otherwise(F.lit("MISMATCH"))
            .alias("verdict"),
        )
    )


def grand_total(audit: DataFrame) -> DataFrame:
    """Cross-table rollup of an audit report (A8,
    tools/ingest_runner.py:1856-1932): grand totals + overall verdict."""
    return audit.agg(
        F.sum("src_cnt").alias("src_total"),
        F.sum("snk_cnt").alias("snk_total"),
        F.sum("diff").alias("total_diff"),
        F.when(F.sum(F.abs(F.col("diff"))) == 0, F.lit("OK"))
        .otherwise(F.lit("MISMATCH"))
        .alias("verdict"),
    )
