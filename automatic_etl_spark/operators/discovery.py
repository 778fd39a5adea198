"""Data-driven schema discovery: candidate keys, functional
dependencies, and foreign-key containment.

The reference *reflects* declared metadata from MySQL
(``information_schema`` PKs — reference tools/discover_mysql_tables.py:181,189
— which then drive the ClickHouse ORDER BY, reference
tools/create_clickhouse_models.py:184-186). That only works when the
source declared its constraints; real lakehouse inputs often did not.
This module discovers the same facts from the DATA, Spark-first:

- ``uniqueness_profile``: one single-scan aggregate computes COUNT,
  COUNT(DISTINCT col) and null counts for every profiled column at
  once (Catalyst plans the multi-distinct via a single Expand — one
  scan, one shuffle, regardless of column count), then explodes the
  1-row result into per-column rows driver-cheaply.
- ``fd_audit``: a functional dependency A→B holds iff no A-group has
  >1 distinct B. Per-FD cost is one det-keyed shuffle with partial
  aggregation; the verdict row is a 1-row rollup.
- ``fk_containment``: child-distinct ∩ parent-distinct via an inner
  join of DISTINCT projections — the parent side is distinct-projected
  first, so at 100 TB the join input is |keys|, not |rows|, and small
  dimension key-sets broadcast.

All pure Column expressions; no UDFs, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automatic_etl_spark.functions.quantize import qround


def uniqueness_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column key-candidacy stats in ONE scan of ``df``.

    Returns (column_name, n_rows, n_distinct, n_nulls, uniqueness,
    is_candidate_key). ``uniqueness`` is n_distinct/n_rows rounded to
    6; a candidate key has every row distinct and no NULLs — the
    data-driven version of the reference's reflected ``primary_key``
    flag (tools/discover_mysql_tables.py:181).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.countDistinct(F.col(c)).alias(f"_d_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_z_{c}")
        )
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"_d_{c}").alias("n_distinct"),
                F.col(f"_z_{c}").alias("n_nulls"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.col("_n").alias("n_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.column_name").alias("column_name"),
            "n_rows",
            F.col("e.n_distinct").alias("n_distinct"),
            F.col("e.n_nulls").alias("n_nulls"),
        )
        .withColumn(
            "uniqueness",
            qround(F.col("n_distinct") / F.col("n_rows")),
        )
        .withColumn(
            "is_candidate_key",
            (F.col("n_distinct") == F.col("n_rows"))
            & (F.col("n_nulls") == 0),
        )
    )


def fd_audit(df: DataFrame, fd_name: str, det: str, dep: str) -> DataFrame:
    """Audit the functional dependency ``det → dep`` on ``df``.

    Returns one row: (fd, n_groups, violating_groups, max_dep_values,
    holds). Violating groups are determinant values mapping to more
    than one distinct dependent value. NULL dependents are ignored by
    COUNT(DISTINCT) on both engines, so an all-NULL group counts as 0
    dependent values (not a violation).
    """
    per_group = df.groupBy(det).agg(
        F.countDistinct(F.col(dep)).alias("dep_values")
    )
    return per_group.agg(
        F.lit(fd_name).alias("fd"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("dep_values") > 1).cast("long")).alias(
            "violating_groups"
        ),
        F.max("dep_values").alias("max_dep_values"),
        (F.max("dep_values") <= 1).alias("holds"),
    )


def fk_containment(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    pair_name: str,
) -> DataFrame:
    """Containment of child key values in the parent key set.

    Returns one row: (pair, child_distinct, contained, containment,
    is_fk). ``containment`` = |distinct child ∩ parent| /
    |distinct child| rounded to 6; is_fk iff containment == 1.0.
    Both sides are DISTINCT-projected before the join, so the join
    operates on key cardinalities; a dimension-sized parent set is
    broadcast by AQE/size estimation — deliberately NOT a forced
    broadcast hint, which would override size estimation and OOM the
    driver when the parent key set is fact-sized (a billion-key
    fact-to-fact FK probe at 100 TB must fall back to a shuffle join).
    """
    c = child.select(F.col(child_col).alias("k")).where(
        F.col(child_col).isNotNull()
    ).distinct()
    p = parent.select(F.col(parent_col).alias("k")).where(
        F.col(parent_col).isNotNull()
    ).distinct()
    joined = c.join(p.withColumn("_hit", F.lit(1)), "k", "left")
    return joined.agg(
        F.lit(pair_name).alias("pair"),
        F.count(F.lit(1)).alias("child_distinct"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("contained"),
    ).select(
        "pair",
        "child_distinct",
        "contained",
        qround(F.col("contained") / F.col("child_distinct")).alias(
            "containment"
        ),
        (F.col("contained") == F.col("child_distinct")).alias("is_fk"),
    )
