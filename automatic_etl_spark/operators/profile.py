"""Profiling / quality operators (SURVEY.md §2.11 Q2-Q5).

The reference profiles per column with pandas (dtype, nulls, nunique,
samples; reference tools/data_cleaner_robust.py:424-499) and tracks
cleaning stats with Python counters (:43-51). Spark-first: one
aggregate pass for the profile and the ``df.observe`` API for
zero-cost pipeline counters (metrics ride along with the action
instead of a second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Q2: one row per column — nulls, distinct count, min/max (as
    strings for heterogeneity). Single aggregate pass over the data;
    at scale swap countDistinct for approx_count_distinct."""
    cols = columns or df.columns

    def q(name: str) -> str:
        # backtick-quote: a source column named "user.name" would
        # otherwise parse as struct-field access in F.col and fail
        # with UNRESOLVED_COLUMN on the derived "__nulls" aliases
        return f"`{name.replace('`', '``')}`"

    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.sum(F.col(q(c)).isNull().cast("long")).alias(f"{c}__nulls"),
                F.countDistinct(F.col(q(c))).alias(f"{c}__distinct"),
                F.min(F.col(q(c))).cast("string").alias(f"{c}__min"),
                F.max(F.col(q(c))).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    stacked = []
    for c in cols:
        stacked.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(q(f"{c}__nulls")).alias("null_cnt"),
                F.col(q(f"{c}__distinct")).alias("distinct_cnt"),
                F.col(q(f"{c}__min")).alias("min_value"),
                F.col(q(f"{c}__max")).alias("max_value"),
            )
        )
    return wide.select(F.explode(F.array(*stacked)).alias("p")).select("p.*")


def observed_cleaning_stats(df: DataFrame, temporal_cols: list[str]) -> tuple[DataFrame, Observation]:
    """Q3: ride-along cleaning counters via df.observe — null rates on
    cleaned temporal columns without a second scan."""
    obs = Observation("cleaning_stats")
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in temporal_cols:
        metrics.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
    return df.observe(obs, *metrics), obs


def usefulness_report(tables: dict[str, DataFrame], min_rows: int = 1) -> list[dict]:
    """Q4: classify tables by emptiness/size (reference
    tools/identify_useful_tables.py:40-90). Driver-side over catalog
    metadata; row counts use parquet statistics (cheap)."""
    # counts overlap on driver threads — Spark schedules the jobs
    # side by side, so 10 tables cost ~the slowest one, not the sum
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(tables)))) as pool:
        counts = dict(
            zip(tables, pool.map(lambda d: d.count(), tables.values()))
        )
    report = []
    for name, df in tables.items():
        cnt = counts[name]
        report.append(
            {
                "table": name,
                "rows": cnt,
                "useful": cnt >= min_rows,
                "numeric_cols": sum(
                    isinstance(f.dataType, NumericType) for f in df.schema.fields
                ),
            }
        )
    return report


def validate_source(df_factory) -> dict:
    """Q5: connection probe — the reference's `SELECT 1` + SHOW TABLES
    health check (tools/ingest_runner.py:1940-2020) generalized to any
    lazy source."""
    try:
        df = df_factory()
        df.limit(1).collect()
        return {"ok": True, "error": None, "columns": df.columns}
    except Exception as exc:  # per-source isolation: never raise
        return {"ok": False, "error": str(exc), "columns": []}
