"""Round-5 analytics/layout pack: pivot, CUBE grouping sets,
deterministic per-group reservoir sampling, distributed table
checksums, and z-order layout statistics.

Same oracle discipline as every other pack: shared constants generate
both the Spark expressions and the DuckDB SQL, integer arithmetic
wherever a value crosses the engine boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table

# --- Pivot -------------------------------------------------------------------

PIVOT_STATUSES = ("O", "F", "P")


@register(
    "pivot_status_priority",
    oracle=f"""
        SELECT o_orderpriority,
               {", ".join(
                   f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0"
                   f" END) AS BIGINT) AS cnt_{s}"
                   for s in PIVOT_STATUSES
               )},
               COUNT(*) AS total
        FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by priority × status. The status domain is
    pinned (explicit pivot values) so Spark skips the extra
    distinct-values job a dynamic pivot needs — at 100 TB an unpinned
    pivot is two passes, a pinned one is a single groupBy with
    conditional aggregates."""
    orders = table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .count()
    )
    # pivot emits NULL for empty cells and names columns by raw value —
    # canonicalize both. total = sum of the pinned columns (one
    # aggregate, no second scan+join); the oracle's COUNT(*) counts ALL
    # rows, so any out-of-domain status surfaces as a value mismatch
    # instead of being silently absorbed.
    cnt_cols = [
        F.coalesce(F.col(s), F.lit(0)).alias(f"cnt_{s}")
        for s in PIVOT_STATUSES
    ]
    total = sum(
        (F.coalesce(F.col(s), F.lit(0)) for s in PIVOT_STATUSES), F.lit(0)
    )
    return pivoted.select(
        "o_orderpriority", *cnt_cols, total.alias("total")
    )


# --- CUBE grouping sets ------------------------------------------------------


@register(
    "cube_sales_margins",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_sales_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping sets in ONE
    pass — Spark expands the cube map-side and aggregates once, vs 4
    separate scans for hand-written rollup levels. GROUPING() flags
    disambiguate a real NULL key from a subtotal row (the contract
    ANSI gives and ad-hoc NULL-labeling loses)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total"),
        )
    )


# --- Unpivot / melt ----------------------------------------------------------

UNPIVOT_METRICS = ("qty_total", "item_cnt", "distinct_orders")


@register(
    "unpivot_returnflag_metrics",
    oracle=f"""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS qty_total,
                   COUNT(*) AS item_cnt,
                   COUNT(DISTINCT l_orderkey) AS distinct_orders
            FROM lineitem GROUP BY l_returnflag
        )
        {" UNION ALL ".join(
            f"SELECT l_returnflag, '{m}' AS metric, {m} AS value FROM wide"
            for m in UNPIVOT_METRICS
        )}
    """,
)
def unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag aggregates → long (flag, metric,
    value) triples via `DataFrame.unpivot` — the write-side complement
    of pivot, and the shape metric stores ingest. The wide aggregate
    is one pass; the melt is a zero-shuffle projection (Spark expands
    rows map-side), so the plan is agg + Expand, nothing else."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total"),
        F.count("*").alias("item_cnt"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=list(UNPIVOT_METRICS),
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- Deterministic per-group reservoir ---------------------------------------
# "Reservoir sample of N per group" with the reservoir decided by a
# salted hash ranking, not an RNG — the same rows win on every engine,
# partitioning, and retry (the reproducibility property RNG reservoirs
# lose at scale; same family as sample_scan / stratified_split).

RESERVOIR_N = 3
RESERVOIR_SALT = "res1"


@register(
    "reservoir_per_group",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY md5('{RESERVOIR_SALT}|'
                                    || CAST(event_id AS VARCHAR)), event_id
                   ) AS rk
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS sample_cnt,
               CAST(SUM(event_id) AS BIGINT) AS id_total
        FROM ranked WHERE rk <= {RESERVOIR_N}
        GROUP BY event_type
    """,
)
def reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic reservoir of {RESERVOIR_N} events per type.
    The rank window prunes to WindowGroupLimit (per-partition top-N
    before the shuffle), so executors ship at most N rows per group —
    the 100 TB shape for per-group sampling. id_total pins exact
    membership, not just counts."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(
            F.concat(
                F.lit(f"{RESERVOIR_SALT}|"), F.col("event_id").cast("string")
            )
        ),
        "event_id",
    )
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= RESERVOIR_N)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("sample_cnt"),
            F.sum("event_id").alias("id_total"),
        )
    )


# --- Distributed table checksum ----------------------------------------------
# How you validate a 100 TB copy without comparing rows: every row
# hashes to a 60-bit integer, XOR-folded per key-bucket. Equal tables
# agree on every bucket; a mismatch names the bucket to re-scan — a
# binary search over data you never move. (The scale form of the
# reference's row-count reconciliation, tools/ingest_runner.py
# audit counts.)

CHECKSUM_BUCKETS = 16
# stable integer/string columns only — float text rendering is not a
# cross-engine contract
_CK_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@register(
    "table_checksum_buckets",
    oracle=f"""
        WITH hashed AS (
            SELECT o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
                   CAST('0x' || substr(md5(concat_ws('|',
                       {", ".join(f"CAST({c} AS VARCHAR)" for c in _CK_COLS)}
                   )), 1, 15) AS BIGINT) AS row_hash
            FROM orders
        )
        SELECT bucket,
               COUNT(*) AS cnt,
               bit_xor(row_hash) AS xor_hash,
               MIN(row_hash) AS min_hash,
               MAX(row_hash) AS max_hash
        FROM hashed GROUP BY bucket
    """,
)
def table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent bucketed checksum of orders: 60-bit md5-prefix
    row hash, XOR-folded per key bucket (+ count/min/max as secondary
    witnesses). One map-side pass + a {CHECKSUM_BUCKETS}-row aggregate;
    XOR is commutative so the result is partitioning- and
    order-invariant by construction."""
    orders = table(spark, sf_dir, "orders")
    row_str = F.concat_ws("|", *[F.col(c).cast("string") for c in _CK_COLS])
    row_hash = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    hashed = orders.select(
        F.pmod("o_orderkey", F.lit(CHECKSUM_BUCKETS)).alias("bucket"),
        row_hash.alias("row_hash"),
    )
    return hashed.groupBy("bucket").agg(
        F.count("*").alias("cnt"),
        F.expr("bit_xor(row_hash)").alias("xor_hash"),
        F.min("row_hash").alias("min_hash"),
        F.max("row_hash").alias("max_hash"),
    )


# --- Z-order layout statistics -----------------------------------------------
# Morton (z-order) interleaving of two join/filter dimensions — the
# data-layout primitive behind multi-dimensional data skipping: sort
# by z-value at write time and a range predicate on EITHER dimension
# prunes most files. Pure integer arithmetic ((x DIV 2^i) % 2 —
# identical semantics in both engines; no engine-specific bit
# operators), generated from one constant.

Z_BITS = 8  # 8 bits per dimension → 16-bit z-value
Z_BUCKET_SHIFT = 256  # bucket = z DIV 256 → 256 buckets


def _z_terms(xcol: str, ycol: str) -> str:
    """SQL for the interleaved z-value of (x % 256, y % 256)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({xcol} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_layout_stats",
    oracle=f"""
        WITH dims AS (
            SELECT o_custkey % {1 << Z_BITS} AS x,
                   o_orderkey % {1 << Z_BITS} AS y
            FROM orders
        ),
        z AS (SELECT {_z_terms('x', 'y')} AS zval FROM dims)
        SELECT zval // {Z_BUCKET_SHIFT} AS z_bucket,
               COUNT(*) AS cnt,
               MIN(zval) AS z_min,
               MAX(zval) AS z_max
        FROM z GROUP BY z_bucket
    """,
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve layout audit: interleave (custkey, orderkey) low
    bits into a z-value, bucket by the z prefix, and report per-bucket
    occupancy + z-range. At 100 TB this is the write-side clustering
    key — `sortWithinPartitions(z)` before the sink gives min/max file
    stats that prune on BOTH dimensions; this query is the audit that
    the z-buckets are balanced (no hot curve region)."""
    orders = table(spark, sf_dir, "orders")
    dims = orders.select(
        F.pmod("o_custkey", F.lit(1 << Z_BITS)).alias("x"),
        F.pmod("o_orderkey", F.lit(1 << Z_BITS)).alias("y"),
    )
    # same arithmetic as the oracle, spelled with Spark's integer DIV
    spark_terms = " + ".join(
        t.replace("//", "DIV") for t in _z_terms("x", "y").split(" + ")
    )
    z = dims.select(F.expr(spark_terms).alias("zval"))
    return (
        z.select(F.expr(f"zval DIV {Z_BUCKET_SHIFT}").alias("z_bucket"), "zval")
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )
