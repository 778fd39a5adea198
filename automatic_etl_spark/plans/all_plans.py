"""Import every plan module so REGISTRY is fully populated."""

from automatic_etl_spark.plans import relational  # noqa: F401

# Populated incrementally as operator packs land (SURVEY.md §7 phases):
try:
    from automatic_etl_spark.plans import cleaning_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import views_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import text_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import dedup_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import similarity_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import cdc_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import ingest_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import multimodal_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import catalog_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import skew_plans  # noqa: F401
except ImportError:
    pass
try:
    from automatic_etl_spark.plans import storage_plans  # noqa: F401
except ImportError:
    pass

try:
    from automatic_etl_spark.plans import sketch_plans  # noqa: F401
except ImportError:
    pass

from automatic_etl_spark.plans.registry import REGISTRY  # noqa: E402

__all__ = ["REGISTRY"]
