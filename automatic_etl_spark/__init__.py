"""automatic_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL/CDC analytics pipeline (``jdmakubex/automatic_etl``):
batch ingestion with a schema-driven cleaning library, window-based
deduplication, Debezium-style CDC stream processing, analytics-view
projections, BI-style relational queries, audit/reconciliation — plus
the large-scale training-data operators (near-dup dedup, similarity
search, text analysis) a 100 TB pipeline needs.

Design principles (see SURVEY.md §7):
- Declare plans with the DataFrame/SQL API; let Catalyst/Tungsten pick
  the physical strategy (predicate pushdown, column pruning, AQE).
- Cleaning is a single projection of built-in ``Column`` expressions —
  never row-at-a-time Python (the reference's biggest perf liability).
- The only Python-on-the-hot-path is Arrow-batched pandas UDFs, and only
  where semantics genuinely require per-value Python (encoding repair).
"""

from automatic_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
