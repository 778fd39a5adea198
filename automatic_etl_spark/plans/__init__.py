"""Query registry: every implemented operator from SURVEY.md §2 is a
named (Spark callable, DuckDB oracle SQL) pair.

Importing :mod:`automatic_etl_spark.plans.all_plans` populates
``REGISTRY``; ``__spark_entry__`` exposes it to the driver.
"""

from automatic_etl_spark.plans.registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
