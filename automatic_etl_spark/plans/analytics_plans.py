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
from automatic_etl_spark.plans.relational import qround
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
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qty_total
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
    li = table(spark, sf_dir, "lineitem", fan_out=False)
    return (
        li.cube("l_returnflag", "l_linestatus").agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("cnt"),
            F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_total"),
        )
    )


# --- Unpivot / melt ----------------------------------------------------------

UNPIVOT_METRICS = ("qty_total", "item_cnt", "distinct_orders")


@register(
    "unpivot_returnflag_metrics",
    oracle=f"""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
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
        # FLOOR before the bigint cast: Spark's decimal->bigint cast
        # truncates while DuckDB's ROUNDS, so a fractional quantity
        # would silently diverge — floor pins both engines (quantities
        # are non-negative, so floor == truncate).
        F.sum(F.floor("l_quantity").cast("bigint")).alias("qty_total"),
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
    orders = table(spark, sf_dir, "orders", fan_out=False)
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


# --- Ordered funnel conversion -----------------------------------------------
# Product-analytics staple: how many users did view -> click ->
# purchase IN TIMESTAMP ORDER. Each stage is "first qualifying event
# strictly after the previous stage's time" — a sequential dependency,
# expressed as three user-keyed aggregates that all reuse one
# user_id partitioning (Spark plans a single exchange chain, no
# re-shuffle between stages).

FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    oracle="""
        WITH s1 AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'view') AS t1
            FROM events GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL
              AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM s1) AS users_total,
               (SELECT COUNT(*) FROM s1 WHERE t1 IS NOT NULL)
                   AS reached_view,
               (SELECT COUNT(*) FROM s2) AS reached_click,
               (SELECT COUNT(*) FROM s3) AS reached_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel over per-user event streams. Stage k's
    anchor is the MIN event time strictly after stage k-1's anchor, so
    out-of-order arrivals can't fake a conversion. All three stage
    aggregates key on user_id — one partitioning reused end to end;
    the final 1-row rollup is three broadcast-joined scalars."""
    ev = table(spark, sf_dir, "events", fan_out=False)
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    s2 = (
        ev.join(s1, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & F.col("t1").isNotNull()
            & (F.col("ts") > F.col("t1"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    a1 = s1.agg(
        F.count("*").alias("users_total"),
        F.count("t1").alias("reached_view"),
    )
    a2 = s2.agg(F.count("*").alias("reached_click"))
    a3 = s3.agg(F.count("*").alias("reached_purchase"))
    return a1.crossJoin(F.broadcast(a2)).crossJoin(F.broadcast(a3))


# --- Retention cohorts -------------------------------------------------------

RETENTION_EPOCH = "2024-01-01"


@register(
    "retention_cohorts",
    oracle=f"""
        WITH weeks AS (
            SELECT user_id,
                   date_diff('day', DATE '{RETENTION_EPOCH}',
                             CAST(ts AS DATE)) // 7 AS wk
            FROM events
        ),
        firsts AS (
            SELECT user_id, MIN(wk) AS cohort_week FROM weeks GROUP BY user_id
        )
        SELECT f.cohort_week,
               w.wk - f.cohort_week AS week_offset,
               COUNT(DISTINCT w.user_id) AS active_users
        FROM weeks w JOIN firsts f ON w.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-active week,
    counted distinct in each later week offset. Week index is integer
    day-arithmetic from a pinned epoch (no engine week-numbering
    semantics involved). Two user-keyed aggregates sharing one
    partitioning + a cohort-keyed rollup."""
    ev = table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id",
        F.expr(
            f"datediff(to_date(ts), DATE'{RETENTION_EPOCH}') DIV 7"
        ).alias("wk"),
    )
    firsts = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        weeks.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# --- Exact-moment correlation / regression -----------------------------------
# Distributed Pearson correlation and OLS slope/intercept WITHOUT the
# order-dependence of naive float aggregation: the five moments are
# EXACT integer sums (quantity as-is, price floored to dollars), so
# partitioning cannot change them; both engines then derive
# corr/slope/intercept from identical integers with identical IEEE
# arithmetic, rounded once. At 100 TB swap the BIGINT moment sums for
# DECIMAL(38,0) (sum of y² crosses 2^63 around 10^12 rows at these
# magnitudes); the derivation is unchanged.


@register(
    "corr_regression_moments",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM (
                SELECT l_returnflag,
                       CAST(FLOOR(l_quantity) AS BIGINT) AS x,
                       CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
                FROM lineitem
            ) GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
                     * 1e6 + 0.5) / 1e6 AS corr_qty_price,
               floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     * 1e6 + 0.5) / 1e6 AS slope,
               floor((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     * 1e6 + 0.5) / 1e6 AS intercept
        FROM m
    """,
)
def corr_regression_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r and OLS fit of price-vs-quantity per return flag via
    exact integer moments (see module comment): one scan, one grouped
    aggregate with map-side partials, then row-local double math."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("bigint").alias("x"),
        F.floor("l_extendedprice").cast("bigint").alias("y"),
    )
    m = pts.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * F.col("sy")
    var_x = n * sxx - sx * F.col("sx")
    var_y = n * syy - sy * F.col("sy")
    return m.select(
        "l_returnflag",
        "n",
        qround(cov_n / F.sqrt(var_x * var_y)).alias("corr_qty_price"),
        qround(cov_n / var_x).alias("slope"),
        qround((sy * F.col("sxx") - sx * F.col("sxy")) / var_x).alias(
            "intercept"
        ),
    )


# --- Equi-width histogram ----------------------------------------------------

HIST_WIDTH = 25  # bucket width over events.value (range ~0-350)


@register(
    "value_histogram_equiwidth",
    oracle=f"""
        SELECT CAST(FLOOR(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
               COUNT(*) AS cnt,
               MIN(value) AS v_min,
               MAX(value) AS v_max
        FROM events GROUP BY bucket
    """,
)
def value_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of the event value: bucket = floor(v/w) is
    row-local integer math, so the whole histogram is one map-side
    pass + a tiny aggregate — the scalable exact histogram
    (equi-DEPTH needs quantiles; see value_percentiles /
    approx_quantile_check for that pair)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.floor(F.col("value") / HIST_WIDTH).cast("bigint").alias(
                "bucket"
            ),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


# --- VARIANT semi-structured extraction --------------------------------------
# Spark 4's VARIANT type: parse the JSON props column ONCE into the
# binary variant encoding, then field extractions are cheap typed
# reads — the engine-native answer to repeated get_json_object parses
# (which re-parse the JSON string per extraction). P6/P7 cover the
# string-path API; this covers the typed path.


@register(
    "variant_props_stats",
    oracle="""
        SELECT event_type,
               COUNT(*) AS events,
               CAST(COUNT(k) AS BIGINT) AS k_present,
               CAST(SUM(k) AS BIGINT) AS k_total,
               MIN(k) AS k_min,
               MAX(k) AS k_max
        FROM (
            -- TRUNC-toward-zero mirror: Spark's try_variant_get(...,
            -- 'long') TRUNCATES fractional numbers (12.7 -> 12,
            -- -12.5 -> -12) while a bare TRY_CAST(... AS BIGINT)
            -- ROUNDS in DuckDB (12.5 -> 13) — a fractional k in any
            -- future fixture would diverge. Documented residual edges
            -- (none occur in the fixtures): JSON booleans (Spark 1/0,
            -- oracle NULL), numeric STRINGS with fractions (Spark
            -- NULL, oracle truncates), > int64 range.
            SELECT event_type,
                   TRY_CAST(TRUNC(TRY_CAST(
                       json_extract_string(props, '$.k') AS DOUBLE
                   )) AS BIGINT) AS k
            FROM events
        ) GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed semi-structured extraction via VARIANT (parse_json →
    try_variant_get): per event type, presence and range stats of the
    numeric `k` prop. One parse per row regardless of how many fields
    are later extracted; extraction is a typed read inside codegen.
    try_variant_get returns NULL on missing/mistyped fields — the same
    tolerate-and-null contract as the cleaning library."""
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.count("k").alias("k_present"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# --- Window frame / value-function family (r6) --------------------------------
# Completes the analytic-window surface beside ranking_functions
# (rank/dense_rank/ntile) and daily_moving_avg (sliding frames):
# first_value / last_value / nth_value over an EXPLICIT full frame,
# plus percent_rank and cume_dist. Frames are pinned ROWS BETWEEN on
# both engines — last_value under the default frame (up to CURRENT
# ROW) is the classic silent-wrong-answer; the explicit unbounded
# frame makes the value deterministic and engine-identical. Order is
# fully tie-broken (ts, event_id) so every value function selects the
# same row on both sides. One window partitioning → one shuffle; the
# final per-type aggregate reuses the same key.

NTH_POS = 3


@register(
    "window_frame_functions",
    oracle=f"""
        WITH w AS (
            SELECT event_type,
                   first_value(value) OVER win AS fv,
                   last_value(value) OVER win AS lv,
                   nth_value(value, {NTH_POS}) OVER win AS nth3,
                   percent_rank() OVER
                       (PARTITION BY event_type
                        ORDER BY ts ASC, event_id ASC) AS pr,
                   cume_dist() OVER
                       (PARTITION BY event_type
                        ORDER BY ts ASC, event_id ASC) AS cd
            FROM events WHERE value IS NOT NULL
            WINDOW win AS (
                PARTITION BY event_type ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            )
        )
        SELECT event_type, COUNT(*) AS cnt,
               MIN(fv) AS first_val, MIN(lv) AS last_val,
               MIN(nth3) AS third_val,
               (CAST(SUM(CAST(floor(pr * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS pr_total,
               (CAST(SUM(CAST(floor(cd * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS cd_total
        FROM w GROUP BY event_type
    """,
)
def window_frame_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an explicit unbounded ROWS frame plus
    percent_rank/cume_dist, aggregated per event_type. The value
    functions are constant within a partition (full frame), so
    MIN(...) just collapses them; percent_rank/cume_dist derive from
    integer ranks → identical doubles, rounded once then decimal-
    summed."""
    ev = table(spark, sf_dir, "events", fan_out=False).filter(
        F.col("value").isNotNull()
    )
    order = [F.asc("ts"), F.asc("event_id")]
    full = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ordered = Window.partitionBy("event_type").orderBy(*order)
    w = ev.select(
        "event_type",
        F.first("value").over(full).alias("fv"),
        F.last("value").over(full).alias("lv"),
        F.nth_value("value", NTH_POS).over(full).alias("nth3"),
        F.percent_rank().over(ordered).alias("pr"),
        F.cume_dist().over(ordered).alias("cd"),
    )
    return w.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.min("fv").alias("first_val"),
        F.min("lv").alias("last_val"),
        F.min("nth3").alias("third_val"),
        (F.sum(F.floor(F.col("pr") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("pr_total"),
        (F.sum(F.floor(F.col("cd") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("cd_total"),
    )


# --- Deterministic array aggregation (r6) -------------------------------------
# collect_list's order is whatever the shuffle delivered — results
# differ run to run, partitioning to partitioning, and engine to
# engine. Any array (or concatenated-string) aggregate that crosses a
# storage or engine boundary must canonicalize: array_sort after
# collect, or sort keys inside the aggregate. This query pins the
# pattern: per-user event-type multiset rendered as a SORTED
# comma-joined string — identical under ANY partitioning, which is
# exactly what the value-hash oracle asserts.


@register(
    "sorted_array_agg",
    oracle="""
        WITH per_user AS (
            -- COALESCE pins the all-NULL-types edge: string_agg over
            -- only NULLs is NULL in DuckDB while Spark's collect_list
            -- skips NULLs and concat_ws renders the empty array as ''
            SELECT user_id,
                   COALESCE(string_agg(event_type, ','
                                       ORDER BY event_type), '')
                       AS type_seq,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT type_seq,
               COUNT(*) AS users,
               CAST(SUM(n_events) AS BIGINT) AS events_total
        FROM per_user GROUP BY type_seq
    """,
)
def sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sorted event-type sequence (array_sort ∘ collect_list,
    rendered via concat_ws) grouped into signature cohorts. The sort
    makes the aggregate partitioning-invariant — the unsorted variant
    is the classic nondeterminism bug this query exists to pin
    against."""
    ev = table(spark, sf_dir, "events", fan_out=False)
    per_user = ev.groupBy("user_id").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_list("event_type"))
        ).alias("type_seq"),
        F.count("*").alias("n_events"),
    )
    return per_user.groupBy("type_seq").agg(
        F.count("*").alias("users"),
        F.sum("n_events").alias("events_total"),
    )


# --- Temporal function surface (r6) -------------------------------------------
# The calendar-arithmetic family in one oracle-checked pass:
# date_trunc to ISO week, last_day month-end distance, ISO
# day-of-week, ISO week number. Cross-engine traps are pinned
# explicitly: Spark's dayofweek is 1=Sunday while DuckDB's is
# 0=Sunday, so both sides normalize to ISO (Monday=1..Sunday=7)
# before anything aggregates; date_trunc('week') agrees on Monday
# but returns timestamp vs date — both cast to DATE.


@register(
    "temporal_functions_surface",
    oracle="""
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
               COUNT(*) AS cnt,
               CAST(SUM(datediff('day', CAST(ts AS DATE),
                                 last_day(CAST(ts AS DATE)))) AS BIGINT)
                   AS month_end_days_total,
               CAST(SUM(CASE WHEN dayofweek(ts) = 0 THEN 7
                             ELSE dayofweek(ts) END) AS BIGINT)
                   AS iso_dow_total,
               MIN(weekofyear(ts)) AS iso_week
        FROM events GROUP BY 1
    """,
)
def temporal_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ISO week over events.ts: row counts, total days-to-month-
    end (last_day arithmetic), ISO day-of-week totals, and the ISO
    week number — every value pinned to engine-identical calendar
    semantics."""
    ev = table(spark, sf_dir, "events", fan_out=False)
    iso_dow = (F.dayofweek("ts") + 5) % 7 + 1
    return (
        ev.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(
                F.datediff(F.last_day(F.col("ts").cast("date")),
                           F.col("ts").cast("date"))
            ).alias("month_end_days_total"),
            F.sum(iso_dow.cast("long")).alias("iso_dow_total"),
            F.min(F.weekofyear("ts")).alias("iso_week"),
        )
    )


# --- Merkle-style checksum repair plan ----------------------------------------
# table_checksum_buckets proves two replicas EQUAL; this is the other
# half of anti-entropy: when they are NOT equal, locate the divergence
# at bucket granularity and produce the minimal row-level repair plan
# reading ONLY the mismatched buckets — at 100 TB the row re-check
# touches |mismatched buckets| / |buckets| of the table, not all of
# it (the Dynamo/Cassandra Merkle-tree repair shape, flattened to one
# level because a bucket list is a DataFrame; deepen the tree by
# adding a second pmod level if bucket row counts outgrow a scan).

REPAIR_MISS_MOD = 97     # primary keys % 97 == 0 are missing downstream
REPAIR_CORRUPT_MOD = 89  # surviving keys % 89 == 0 are corrupted

_CK_ROWSTR = "concat_ws('|', " + ", ".join(
    f"CAST({c} AS VARCHAR)" for c in _CK_COLS
) + ")"

_REPAIR_ORACLE = f"""
    WITH replica AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % {REPAIR_CORRUPT_MOD} = 0
                    THEN o_orderpriority || '*'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % {REPAIR_MISS_MOD} <> 0
    ),
    ph AS (
        SELECT o_orderkey AS k, o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
               CAST('0x' || substr(md5({_CK_ROWSTR}), 1, 15) AS BIGINT)
                   AS h
        FROM orders
    ),
    rh AS (
        SELECT o_orderkey AS k, o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
               CAST('0x' || substr(md5({_CK_ROWSTR}), 1, 15) AS BIGINT)
                   AS h
        FROM replica
    ),
    pb AS (SELECT bucket, COUNT(*) AS c, bit_xor(h) AS x FROM ph GROUP BY bucket),
    rb AS (SELECT bucket, COUNT(*) AS c, bit_xor(h) AS x FROM rh GROUP BY bucket),
    mism AS (
        SELECT COALESCE(pb.bucket, rb.bucket) AS bucket
        FROM pb FULL OUTER JOIN rb ON pb.bucket = rb.bucket
        WHERE COALESCE(pb.c, 0) <> COALESCE(rb.c, 0) OR pb.x <> rb.x
    ),
    joined AS (
        SELECT COALESCE(p.bucket, r.bucket) AS bucket,
               CASE WHEN r.k IS NULL THEN 'missing_in_replica'
                    WHEN p.k IS NULL THEN 'orphan_in_replica'
                    WHEN p.h <> r.h THEN 'corrupt_in_replica'
                    ELSE 'verified_equal' END AS action
        FROM (SELECT * FROM ph WHERE bucket IN (SELECT bucket FROM mism)) p
        FULL OUTER JOIN
             (SELECT * FROM rh WHERE bucket IN (SELECT bucket FROM mism)) r
          ON p.k = r.k
    )
    SELECT action, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets
    FROM joined GROUP BY action
"""


@register("checksum_repair_plan", oracle=_REPAIR_ORACLE)
def checksum_repair_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair plan between primary orders and a replica
    with planted drift (every 97th key missing, every surviving 89th
    key corrupted in o_orderpriority): bucket checksums first, then a
    row-level full-outer re-check restricted to the mismatched buckets
    only, classifying each row as missing/corrupt/orphan/verified.

    Scale shape: phase 1 is two map-side passes + two 16-row bucket
    aggregates; phase 2 streams each side against the BROADCAST
    mismatched-bucket list (a semi-join the scan can partition-prune
    on when the table is bucket-partitioned — only divergent buckets
    are ever re-read) and full-outer-joins on the key WITHIN those
    buckets. The reference reconciles by table-level row counts
    (tools/verificar_datos.py); this is the row-granular, scan-
    minimal version of the same audit."""
    orders = table(spark, sf_dir, "orders", fan_out=False).select(*_CK_COLS)
    replica = orders.where(
        F.col("o_orderkey") % REPAIR_MISS_MOD != 0
    ).withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % REPAIR_CORRUPT_MOD == 0,
            F.concat(F.col("o_orderpriority"), F.lit("*")),
        ).otherwise(F.col("o_orderpriority")),
    )
    return repair_plan(orders, replica)


def repair_plan(orders: DataFrame, replica: DataFrame) -> DataFrame:
    """Row-granular anti-entropy repair core shared by the registry
    query and the vanished-bucket unit: bucket checksums, mismatch
    detection, then a row-level full-outer re-check restricted to the
    mismatched buckets."""

    def hashed(df: DataFrame) -> DataFrame:
        row_str = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in _CK_COLS]
        )
        return df.select(
            F.col("o_orderkey").alias("k"),
            F.pmod("o_orderkey", F.lit(CHECKSUM_BUCKETS)).alias("bucket"),
            F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )

    ph = hashed(orders).localCheckpoint(eager=True)
    rh = hashed(replica).localCheckpoint(eager=True)
    pb = ph.groupBy("bucket").agg(
        F.count("*").alias("pc"), F.expr("bit_xor(h)").alias("px")
    )
    rb = rh.groupBy("bucket").agg(
        F.count("*").alias("rc"), F.expr("bit_xor(h)").alias("rx")
    )
    # FULL OUTER with counts coalesced to 0: a bucket entirely absent
    # from one replica must surface as mismatched, or its rows would be
    # silently excluded from the repair plan (an inner join here only
    # catches buckets present on BOTH sides). The xor clause needs no
    # null-coalescing — a one-sided bucket always trips the count test.
    mism = (
        pb.join(rb, "bucket", "full_outer")
        .where(
            (F.coalesce("pc", F.lit(0)) != F.coalesce("rc", F.lit(0)))
            | (F.col("px") != F.col("rx"))
        )
        .select("bucket")
    )
    p = ph.join(F.broadcast(mism), "bucket").select(
        "bucket", F.col("k").alias("pk"), F.col("h").alias("phash")
    )
    r = rh.join(F.broadcast(mism), "bucket").select(
        F.col("bucket").alias("rbucket"),
        F.col("k").alias("rk"),
        F.col("h").alias("rhash"),
    )
    joined = p.join(r, p.pk == r.rk, "full_outer").select(
        F.coalesce("bucket", "rbucket").alias("bucket"),
        F.when(F.col("rk").isNull(), "missing_in_replica")
        .when(F.col("pk").isNull(), "orphan_in_replica")
        .when(F.col("phash") != F.col("rhash"), "corrupt_in_replica")
        .otherwise("verified_equal")
        .alias("action"),
    )
    return joined.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("bucket").cast("bigint").alias("n_buckets"),
    )


# --- Map-typed aggregation state (map HOF surface) ----------------------------

_MAP_DELTA_ORACLE = """
    WITH per_cell AS (
        SELECT user_id, event_type,
               CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1
        FROM events GROUP BY user_id, event_type
    ),
    changed AS (
        SELECT user_id, event_type, c1 - c0 AS delta
        FROM per_cell WHERE c1 - c0 <> 0
    )
    SELECT event_type,
           COUNT(*) AS n_users_changed,
           CAST(SUM(delta) AS BIGINT) AS total_delta,
           CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_users_up
    FROM changed GROUP BY event_type
"""


@register("map_delta_report", oracle=_MAP_DELTA_ORACLE)
def map_delta_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior delta computed THROUGH map-typed columns:
    each user's per-event-type counts in epoch 0/1 (event_id parity)
    are carried as `map<string,bigint>` aggregation state, diffed with
    `map_zip_with` (key-union semantics supply the missing-key zero),
    pruned with `map_filter`, and exploded back to rows. The oracle is
    the plain relational formulation — proving the map pipeline
    computes the same truth.

    Why maps at scale: the map form keeps ONE row per (user, epoch)
    through the shuffle instead of one per (user, epoch, type) — for
    wide type domains that is the difference between shuffling |users|
    rows and |users|×|types|. All map functions are codegen'd Catalyst
    expressions (no UDF), and the collect_list feeding
    map_from_entries is per-(user,epoch) bounded by the type domain.
    Fixture note: the local fan-out repartition (sources/parquet.py)
    sits mid-plan, so counts are pre-aggregated per cell before map
    assembly — the same two-level agg a cluster plan would use."""
    ev = table(spark, sf_dir, "events", fan_out=False).select(
        "user_id",
        "event_type",
        (F.col("event_id") % 2).cast("int").alias("epoch"),
    )
    cells = ev.groupBy("user_id", "epoch", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    maps = cells.groupBy("user_id", "epoch").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    m0 = maps.where(F.col("epoch") == 0).select(
        "user_id", F.col("m").alias("m0")
    )
    m1 = maps.where(F.col("epoch") == 1).select(
        "user_id", F.col("m").alias("m1")
    )
    empty = F.expr("map()").cast("map<string,bigint>")
    joined = m0.join(m1, "user_id", "full_outer").select(
        "user_id",
        F.coalesce("m0", empty).alias("m0"),
        F.coalesce("m1", empty).alias("m1"),
    )
    delta = joined.select(
        "user_id",
        F.map_filter(
            F.map_zip_with(
                "m0",
                "m1",
                lambda _k, v0, v1: F.coalesce(v1, F.lit(0).cast("bigint"))
                - F.coalesce(v0, F.lit(0).cast("bigint")),
            ),
            lambda _k, v: v != 0,
        ).alias("changed"),
    )
    exploded = delta.select(
        "user_id", F.explode("changed").alias("event_type", "delta")
    )
    return exploded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users_changed"),
        F.sum("delta").cast("bigint").alias("total_delta"),
        F.sum((F.col("delta") > 0).cast("long"))
        .cast("bigint")
        .alias("n_users_up"),
    )


# --- Kaplan–Meier survival (time-to-conversion) -------------------------------
# Survival analysis over the event log: time from each user's first
# event to their first subsequent purchase, right-censored at a fixed
# observation window (the standard product-analytics "time to
# convert" curve). The KM estimator is all integer counts until the
# per-time hazard; survival is reported in LOG space — cumulative sum
# of ln(1 − d_i/n_i) — because ln parity across engines is already
# established (unigram/zipf precedents) while exp() is libm-divergent
# between the JVM and C runtimes.

KM_WINDOW_DAYS = 2


@register(
    "kaplan_meier_survival",
    oracle=f"""
        WITH f AS (
            SELECT user_id, MIN(ts) AS first_ev FROM events GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS purch
            FROM events e JOIN f ON e.user_id = f.user_id
                          AND e.ts > f.first_ev
            WHERE e.event_type = 'purchase'
            GROUP BY e.user_id
        ),
        cohort AS (
            SELECT f.user_id,
                   CASE WHEN p.user_id IS NOT NULL
                         AND datediff('day', CAST(f.first_ev AS DATE),
                                      CAST(p.purch AS DATE))
                             <= {KM_WINDOW_DAYS}
                        THEN datediff('day', CAST(f.first_ev AS DATE),
                                      CAST(p.purch AS DATE))
                        ELSE {KM_WINDOW_DAYS} END AS t,
                   CASE WHEN p.user_id IS NOT NULL
                         AND datediff('day', CAST(f.first_ev AS DATE),
                                      CAST(p.purch AS DATE))
                             <= {KM_WINDOW_DAYS}
                        THEN 1 ELSE 0 END AS ev
            FROM f LEFT JOIN p ON f.user_id = p.user_id
        ),
        km AS (
            SELECT t,
                   CAST(SUM(ev) AS BIGINT) AS d_i,
                   CAST(SUM(1 - ev) AS BIGINT) AS c_i
            FROM cohort GROUP BY t
        ),
        risk AS (
            SELECT t, d_i, c_i,
                   CAST((SELECT COUNT(*) FROM cohort)
                        - COALESCE(SUM(d_i + c_i) OVER (
                              ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
                        AS BIGINT) AS n_risk
            FROM km
        )
        SELECT t AS time_days, n_risk, d_i AS n_events,
               c_i AS n_censored,
               -- d_i = n_risk means S(t) hits exactly 0 (ln = -inf,
               -- only possible at the final emitted time point):
               -- report NULL for that row on BOTH engines — DuckDB's
               -- ln(0) otherwise hard-errors while Spark's log(0)
               -- yields NULL that SUM silently skips (a finite wrong
               -- value). The guarded term keeps the oracle runnable.
               CASE WHEN d_i = n_risk THEN NULL ELSE
                   floor(CAST(SUM(CASE WHEN d_i < n_risk THEN
                                  CAST(floor(ln(1.0 - CAST(d_i AS DOUBLE)
                                                 / n_risk) * 1e8 + 0.5) / 1e8
                                       AS DECIMAL(18,8)) END) OVER (
                                 ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
                             AS DOUBLE) * 1e6 + 0.5) / 1e6
               END AS log_survival
        FROM risk WHERE d_i > 0
    """,
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-conversion: per observed conversion day,
    users at risk, conversions, window-censored exits, and the
    cumulative log-survival ln S(t) = Σ ln(1 − d_i/n_i).

    Scale shape: two user-keyed aggregates (first event; first
    subsequent purchase) co-partition on user_id and join once; the
    KM table itself is TIME-compressed — every window below runs over
    ≤ KM_WINDOW_DAYS+1 rows, never over users — and the cohort size
    enters as a broadcast scalar. Hazards round at one site then sum
    as DECIMAL (ln parity precedent); exp() is deliberately avoided
    (JVM Math.exp vs C libm differ in the last ulp)."""
    ev = table(spark, sf_dir, "events", fan_out=False)
    f = ev.groupBy("user_id").agg(F.min("ts").alias("first_ev"))
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .where(F.col("ts") > F.col("first_ev"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purch"))
    )
    rawd = F.datediff(
        F.col("purch").cast("date"), F.col("first_ev").cast("date")
    )
    converted = F.col("purch").isNotNull() & (rawd <= KM_WINDOW_DAYS)
    cohort = f.join(p, "user_id", "left").select(
        F.when(converted, rawd)
        .otherwise(F.lit(KM_WINDOW_DAYS))
        .alias("t"),
        converted.cast("int").alias("ev"),
    )
    km = cohort.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c_i"),
    )
    n_total = cohort.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = km.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d_i",
        "c_i",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d_i") + F.col("c_i")).over(w_prev), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    # d_i = n_risk → S(t) = 0 exactly (ln = -inf, only possible at the
    # final emitted time point): emit NULL log_survival for that row,
    # mirroring the oracle's CASE guard — an unguarded F.log(0) returns
    # NULL that SUM silently SKIPS (a finite wrong value) while
    # DuckDB's ln(0) hard-errors: divergent failure modes either way.
    log_term = F.when(
        F.col("d_i") < F.col("n_risk"),
        qround(
            F.log(1.0 - F.col("d_i").cast("double") / F.col("n_risk")), 8
        ).cast("decimal(18,8)"),
    )
    return (
        risk.select(
            F.col("t").alias("time_days"),
            "n_risk",
            F.col("d_i").alias("n_events"),
            F.col("c_i").alias("n_censored"),
            F.when(
                F.col("d_i") < F.col("n_risk"),
                qround(F.sum(log_term).over(w_cum).cast("double")),
            ).alias("log_survival"),
            F.col("d_i").alias("_d"),
        )
        .where(F.col("_d") > 0)
        .drop("_d")
    )


# --- Peak concurrency (interval overlap maximum) ------------------------------
# "How many sessions were open at once?" — the interval-overlap peak
# via the ±1 boundary sweep. The textbook formulation is ONE running
# sum over the type's whole timeline — a single-partition window per
# type, the same scale-killer the surrogate-key plan avoids — so the
# Spark side computes it TWO-PHASE: per (type, hour-slice) local
# running sums, then per-type cumulative slice offsets (a bounded
# slice frame), peak = max(offset + local running). The ORACLE is the
# naive single-window formulation — proving the decomposition exact.

CONC_SLICE_MS = 3_600_000  # 1-hour slices
CONC_MAX_MIN = 120         # session duration = clamp(value, 1, 120) min

_CONC_ORACLE = f"""
    WITH iv AS (
        SELECT event_type,
               epoch_ms(ts) AS s,
               epoch_ms(ts) + CAST(greatest(1, least({CONC_MAX_MIN},
                   floor(value))) AS BIGINT) * 60000 AS e
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    b AS (
        SELECT event_type, s AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 FROM iv
    ),
    run AS (
        SELECT event_type,
               SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS r
        FROM b
    )
    SELECT event_type,
           CAST((SELECT COUNT(*) FROM iv i
                 WHERE i.event_type = run.event_type) AS BIGINT)
               AS n_intervals,
           CAST(MAX(r) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY event_type
"""


@register("peak_concurrency_report", oracle=_CONC_ORACLE)
def peak_concurrency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum simultaneous open sessions per event type (session =
    [ts, ts + clamp(value,1,120) minutes]), computed scale-safe: the
    ±1 boundary stream is cut into hour slices, running sums stay
    LOCAL to a (type, slice) partition, and a bounded per-type slice
    frame supplies cumulative offsets — no window ever spans a type's
    whole timeline. Tie policy pinned to (t, delta asc) so an end at
    time T closes before a start at T opens (touching sessions never
    double-count); among equal boundaries the prefix multiset is
    permutation-invariant, so the peak is deterministic. The oracle
    is the textbook single-window sweep — the decomposition must
    match it exactly."""
    iv = (
        table(spark, sf_dir, "events", fan_out=False)
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.unix_millis("ts").alias("s"),
            (
                F.unix_millis("ts")
                + F.greatest(
                    F.lit(1),
                    F.least(F.lit(CONC_MAX_MIN), F.floor("value")),
                ).cast("bigint")
                * 60000
            ).alias("e"),
        )
    )
    b = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta")
        )
    ).withColumn(
        "slice", F.call_function("div", F.col("t"), F.lit(CONC_SLICE_MS))
    )
    w_local = (
        Window.partitionBy("event_type", "slice")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.select(
        "event_type", "slice", "delta",
        F.sum("delta").over(w_local).alias("run"),
    )
    slices = local.groupBy("event_type", "slice").agg(
        F.sum("delta").alias("tot"), F.max("run").alias("loc_max")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    peaks = slices.select(
        "event_type",
        (
            F.coalesce(F.sum("tot").over(w_off), F.lit(0))
            + F.col("loc_max")
        ).alias("candidate"),
    ).groupBy("event_type").agg(
        F.max("candidate").cast("bigint").alias("peak_concurrency")
    )
    counts = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals")
    )
    return counts.join(peaks, "event_type").select(
        "event_type", "n_intervals", "peak_concurrency"
    )
