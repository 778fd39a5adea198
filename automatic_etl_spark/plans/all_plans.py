"""Import every plan module so REGISTRY is fully populated.

Imports are unconditional: a broken module must fail loudly here, not
silently drop its whole query pack from the registry and from all
verification (the round-1 ImportError guards were phase-gating that no
longer applies).
"""

from automatic_etl_spark.plans import (  # noqa: F401
    analytics_plans,
    catalog_plans,
    cdc_plans,
    cleaning_plans,
    curation_plans,
    dedup_plans,
    discovery_plans,
    enrichment_plans,
    ingest_plans,
    integrity_plans,
    mixing_plans,
    profiling_plans,
    multimodal_plans,
    relational,
    similarity_plans,
    sketch_plans,
    skew_plans,
    storage_plans,
    text_plans,
    training_plans,
    views_plans,
)
from automatic_etl_spark.plans.registry import REGISTRY

# Backstop against a pack silently vanishing (e.g. a module that stops
# registering at import time): the registry can only grow from here.
_MIN_EXPECTED_QUERIES = 253
assert len(REGISTRY) >= _MIN_EXPECTED_QUERIES, (
    f"registry shrank: {len(REGISTRY)} < {_MIN_EXPECTED_QUERIES} — "
    "a plan module stopped registering its queries"
)

__all__ = ["REGISTRY"]
