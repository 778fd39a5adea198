"""Skew-mitigation operators: key salting for joins and aggregations.

The reference runs everything single-threaded in pandas, so skew never
surfaces there; on a 1000-executor cluster a hot key turns one reduce
task into the job's critical path. AQE's skew-join split handles the
sort-merge case adaptively; these operators are the EXPLICIT variant
for when the skew is known up front (e.g. a handful of event types over
billions of rows) or the plan shape AQE can't rewrite (aggregation
fan-in, hinted joins).

Both are result-identical to their unsalted forms — the DuckDB oracles
in plans/skew_plans.py run the PLAIN join/agg SQL against them.

- :func:`salted_join` — fact rows get a deterministic salt in
  [0, buckets); the dim side is replicated buckets× with an exploded
  salt sequence; joining on (key, salt) spreads one hot key over
  `buckets` reduce partitions. Dim-side cost: |dim| × buckets rows —
  use for small-dim/huge-skewed-fact joins (the only shape that needs
  salting; big-big skewed joins are AQE's job).
- :func:`salted_agg` — two-phase aggregation: partials per
  (key, salt), then final merge per key. Map-side combine already
  covers plain sum/count; the two-phase shape is what you need when
  per-key containers would otherwise concentrate on one reducer
  (collect_set-style aggs) or when feeding a salted join downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# (merge_fn, partial_fn) per supported aggregate: partial runs per
# (key, salt), merge combines partials per key. All four are algebraic,
# so the two phases compose exactly.
_AGG_FNS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.sum, F.count),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _fact_salt(fact: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the full row, mod buckets.
    Deterministic under task retry (no rand()), uniform enough to
    spread a hot key."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(buckets)
    ).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a huge skewed ``fact`` against a small
    ``dim``; result is identical to ``fact.join(dim, key, how)``.

    Only fact-preserving join types are supported: the dim side is
    REPLICATED once per salt bucket, so a right/full outer join would
    emit every unmatched dim row ``buckets`` times — silently wrong,
    hence the hard error. For those, join the other way around or
    dedup the dim-only remainder separately (anti-join + union).
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim "
            f"rows {buckets}x (dim is salt-replicated); use a "
            "fact-preserving join type"
        )
    keys = [key] if isinstance(key, str) else list(key)
    f = fact.withColumn(_SALT, _fact_salt(fact, buckets))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, keys + [_SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skewed aggregation. ``aggs`` maps output column name →
    ``(fn, input_col)`` with fn in {sum, count, min, max}; result is
    identical to the plain ``df.groupBy(keys).agg(...)``."""
    for name, (fn, _col) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"{name}: unsupported salted aggregate {fn!r}")
    salted = df.withColumn(_SALT, _fact_salt(df, buckets))
    partials = salted.groupBy(*keys, _SALT).agg(
        *[
            _AGG_FNS[fn][1](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partials.groupBy(*keys).agg(
        *[
            _AGG_FNS[fn][0](f"__p_{name}").alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
