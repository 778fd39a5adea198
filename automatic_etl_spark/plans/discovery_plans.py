"""Oracle-checked plans for data-driven schema discovery and
statistical data-quality audits.

The reference trusts DECLARED metadata: MySQL information_schema PKs
(reference tools/discover_mysql_tables.py:150-189) become the
ClickHouse ORDER BY (reference tools/create_clickhouse_models.py:
184-186), and FK relationships are implicit in its generated BI
queries. This pack discovers the same facts from the data itself —
candidate keys, functional dependencies, FK containment — plus the
statistical profiling a data platform layers on top (entropy/gini
column profiles, Benford first-digit audit, k-anonymity, event
transition mining, brand co-occurrence lift).

Float policy (the unigram_logprob_quality precedent): any value that
is a sum of per-row logs is rounded at ONE site per term, summed as
DECIMAL, and only then divided/combined in a single pinned expression
identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automatic_etl_spark.operators import discovery as dc
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.sources.parquet import table

# --- Candidate-key discovery -------------------------------------------------

_KEY_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"]

_KEY_ORACLE = "\nUNION ALL\n".join(
    f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               floor(CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*)
                     * 1e6 + 0.5) / 1e6
                   AS uniqueness,
               COUNT(DISTINCT {c}) = COUNT(*)
                   AND SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) = 0
                   AS is_candidate_key
        FROM customer
    """
    for c in _KEY_COLS
)


@register("candidate_key_report", oracle=_KEY_ORACLE)
def candidate_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven PK discovery on customer: which columns are unique
    and non-null across all rows? One scan, one multi-distinct
    aggregate (Catalyst Expand), per-column rows exploded from the
    1-row result — at 100 TB this is a single pass no matter how many
    columns are profiled. Extends the reference's reflected
    ``primary_key`` flag (tools/discover_mysql_tables.py:181) to
    sources that never declared their keys."""
    return dc.uniqueness_profile(
        table(spark, sf_dir, "customer", fan_out=False), _KEY_COLS
    )


# --- Functional-dependency audit ---------------------------------------------

_FD_ORACLE = """
    WITH f1 AS (
        SELECT COUNT(DISTINCT n_regionkey) AS dv
        FROM nation GROUP BY n_nationkey
    ),
    f2 AS (
        SELECT COUNT(DISTINCT c_mktsegment) AS dv
        FROM customer GROUP BY c_nationkey
    ),
    f3 AS (
        SELECT COUNT(DISTINCT o_orderpriority) AS dv
        FROM orders GROUP BY o_custkey
    )
    SELECT 'nation.n_nationkey->n_regionkey' AS fd,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_groups,
           MAX(dv) AS max_dep_values,
           MAX(dv) <= 1 AS holds
    FROM f1
    UNION ALL
    SELECT 'customer.c_nationkey->c_mktsegment',
           COUNT(*),
           CAST(SUM(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT),
           MAX(dv), MAX(dv) <= 1
    FROM f2
    UNION ALL
    SELECT 'orders.o_custkey->o_orderpriority',
           COUNT(*),
           CAST(SUM(CASE WHEN dv > 1 THEN 1 ELSE 0 END) AS BIGINT),
           MAX(dv), MAX(dv) <= 1
    FROM f3
"""


@register("functional_dependency_audit", oracle=_FD_ORACLE)
def functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FD discovery: A→B holds iff no A-group maps to >1 distinct B.
    One det-keyed shuffle per audited FD (partial aggregation
    map-side), 1-row verdicts unioned. The structural FD
    (nation→region) holds; the two behavioral ones are expected
    violations — the report quantifies HOW broken, which is what a
    layout chooser needs (a nearly-functional dependency is still a
    good sort-key prefix)."""
    nation = table(spark, sf_dir, "nation", fan_out=False)
    customer = table(spark, sf_dir, "customer", fan_out=False)
    orders = table(spark, sf_dir, "orders", fan_out=False)
    parts = [
        dc.fd_audit(
            nation, "nation.n_nationkey->n_regionkey",
            "n_nationkey", "n_regionkey",
        ),
        dc.fd_audit(
            customer, "customer.c_nationkey->c_mktsegment",
            "c_nationkey", "c_mktsegment",
        ),
        dc.fd_audit(
            orders, "orders.o_custkey->o_orderpriority",
            "o_custkey", "o_orderpriority",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- Foreign-key discovery by value containment ------------------------------

_FK_PAIRS_SQL = """
    WITH pair AS (
        SELECT 'orders.o_custkey->customer.c_custkey' AS pair,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders
                WHERE o_custkey IS NOT NULL) AS child_distinct,
               (SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey) AS contained
        UNION ALL
        SELECT 'lineitem.l_partkey->part.p_partkey',
               (SELECT COUNT(DISTINCT l_partkey) FROM lineitem
                WHERE l_partkey IS NOT NULL),
               (SELECT COUNT(DISTINCT l.l_partkey) FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey)
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
               (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem
                WHERE l_suppkey IS NOT NULL),
               (SELECT COUNT(DISTINCT l.l_suppkey) FROM lineitem l
                JOIN supplier s ON l.l_suppkey = s.s_suppkey)
        UNION ALL
        SELECT 'customer.c_nationkey->region.r_regionkey',
               (SELECT COUNT(DISTINCT c_nationkey) FROM customer
                WHERE c_nationkey IS NOT NULL),
               (SELECT COUNT(DISTINCT c.c_nationkey) FROM customer c
                JOIN region r ON c.c_nationkey = r.r_regionkey)
    )
    SELECT pair, child_distinct, contained,
           floor(CAST(contained AS DOUBLE) / child_distinct
                 * 1e6 + 0.5) / 1e6
               AS containment,
           contained = child_distinct AS is_fk
    FROM pair
"""


@register("fk_discovery_containment", oracle=_FK_PAIRS_SQL)
def fk_discovery_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FK discovery by value containment: |distinct(child) ∩ parent| /
    |distinct(child)|. Three true FKs (containment 1.0) and one
    deliberate near-miss (c_nationkey vs r_regionkey overlaps only on
    keys 0-4). Both sides DISTINCT-project before the join, so at
    100 TB the join is over key cardinalities; parent key-sets are
    dimension-sized and broadcast. This is the discovery the
    reference's generated BI joins presuppose but never verify."""
    # fan_out=False (r14): every scan feeds a DISTINCT partial
    # aggregate immediately — the fan-out repartition round-robin-
    # shuffled full fact tables that the next operator collapses to
    # key cardinalities anyway.
    orders = table(spark, sf_dir, "orders", fan_out=False)
    customer = table(spark, sf_dir, "customer", fan_out=False)
    lineitem = table(spark, sf_dir, "lineitem", fan_out=False)
    part = table(spark, sf_dir, "part", fan_out=False)
    supplier = table(spark, sf_dir, "supplier", fan_out=False)
    region = table(spark, sf_dir, "region", fan_out=False)
    parts = [
        dc.fk_containment(
            orders, "o_custkey", customer, "c_custkey",
            "orders.o_custkey->customer.c_custkey",
        ),
        dc.fk_containment(
            lineitem, "l_partkey", part, "p_partkey",
            "lineitem.l_partkey->part.p_partkey",
        ),
        dc.fk_containment(
            lineitem, "l_suppkey", supplier, "s_suppkey",
            "lineitem.l_suppkey->supplier.s_suppkey",
        ),
        dc.fk_containment(
            customer, "c_nationkey", region, "r_regionkey",
            "customer.c_nationkey->region.r_regionkey",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- Entropy / gini column profile -------------------------------------------
# entropy = ln(n) - sum(c*ln(c))/n  (algebraic form avoids a per-row
# p=c/n broadcast); per-term c*ln(c) rounded once, summed as DECIMAL.
# gini = 1 - sum(c^2)/n^2 stays in exact integers until one division.


def _entropy_sql(tbl: str, col: str) -> str:
    return f"""
        SELECT '{tbl}.{col}' AS column_name,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_distinct,
               floor((ln(CAST(SUM(cnt) AS DOUBLE))
                      - CAST(SUM(CAST(floor(cnt * ln(CAST(cnt AS DOUBLE))
                                            * 1e6 + 0.5) / 1e6
                                      AS DECIMAL(28,6))) AS DOUBLE)
                        / SUM(cnt)) * 1e6 + 0.5) / 1e6 AS entropy_nats,
               floor((1.0 - CAST(SUM(cnt * cnt) AS DOUBLE)
                      / (CAST(SUM(cnt) AS DOUBLE) * SUM(cnt)))
                     * 1e6 + 0.5) / 1e6 AS gini
        FROM (SELECT {col}, COUNT(*) AS cnt FROM {tbl}
              WHERE {col} IS NOT NULL GROUP BY {col})
    """


_ENTROPY_ORACLE = "\nUNION ALL\n".join(
    _entropy_sql(t, c)
    for t, c in [
        ("events", "event_type"),
        ("documents", "lang"),
        ("documents", "source"),
    ]
)


def _entropy_profile(df: DataFrame, tbl: str, col: str) -> DataFrame:
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.agg(
        F.lit(f"{tbl}.{col}").alias("column_name"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            qround(
                F.col("cnt") * F.log(F.col("cnt").cast("double"))
            ).cast("decimal(28,6)")
        ).alias("_slog"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("_ssq"),
    ).select(
        "column_name",
        "n_rows",
        "n_distinct",
        qround(
            F.log(F.col("n_rows").cast("double"))
            - F.col("_slog").cast("double") / F.col("n_rows")
        ).alias("entropy_nats"),
        qround(
            F.lit(1.0)
            - F.col("_ssq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows"))
        ).alias("gini"),
    )


@register("column_entropy_profile", oracle=_ENTROPY_ORACLE)
def column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) + Gini impurity per categorical column —
    the information-theoretic upgrade of the reference's null-rate
    usefulness classifier (tools/ingest_runner.py cleaning stats): a
    column with near-zero entropy carries no signal even if fully
    populated. The algebraic form ln(n) − Σc·ln(c)/n needs only ONE
    value-keyed aggregate per column (no per-row p=c/n broadcast);
    gini stays in exact integer arithmetic until a single pinned
    division."""
    events = table(spark, sf_dir, "events", fan_out=False)
    docs = table(spark, sf_dir, "documents", fan_out=False)
    parts = [
        _entropy_profile(events, "events", "event_type"),
        _entropy_profile(docs, "documents", "lang"),
        _entropy_profile(docs, "documents", "source"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- Benford first-digit audit -----------------------------------------------
# First digit extracted via exact integer cents (the decimal_fidelity
# precedent: double→cents pinned to one IEEE rounding site on both
# engines), never via float→string formatting.

_BENFORD_ORACLE = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    counted AS (
        SELECT digit, COUNT(*) AS cnt FROM digits GROUP BY digit
    ),
    total AS (SELECT SUM(cnt) AS n FROM counted)
    SELECT digit, cnt,
           floor(CAST(cnt AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS observed,
           floor(ln(1.0 + 1.0 / digit) / ln(10.0) * 1e6 + 0.5) / 1e6
               AS expected,
           floor(abs(floor(CAST(cnt AS DOUBLE) / n * 1e6 + 0.5) / 1e6
                     - floor(ln(1.0 + 1.0 / digit) / ln(10.0)
                             * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
               AS abs_dev
    FROM counted CROSS JOIN total
"""


@register("benford_first_digit", oracle=_BENFORD_ORACLE)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of o_totalprice: first-significant-digit
    distribution vs log10(1+1/d). Fabricated or truncated numeric
    feeds fail this audit long before row-level checks notice. The
    digit comes from exact integer cents (no float formatting); one
    9-key aggregate, then the ≤9-row digit frame is materialized so
    the grand total does NOT re-scan orders — constant-size shuffle
    at any scale, exactly one pass over the fact table."""
    orders = table(spark, sf_dir, "orders", fan_out=False)
    digits = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            # round-ok: scale-0 cents recovery — 2-dp money ×100 is
            # within 1 ulp of an integer, 0.5 margin from any half.
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counted = (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = counted.agg(F.sum("cnt").alias("n"))
    obs = qround(F.col("cnt").cast("double") / F.col("n"))
    exp = qround(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    )
    return counted.crossJoin(F.broadcast(total)).select(
        "digit",
        "cnt",
        obs.alias("observed"),
        exp.alias("expected"),
        qround(F.abs(obs - exp)).alias("abs_dev"),
    )


# --- Event transition mining -------------------------------------------------

_TRANSITION_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY cnt DESC, prev_type, next_type
    LIMIT 20
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition mining over per-user event sequences: lag()
    within (user_id, ts, event_id)-ordered windows, then a bigram
    count. The window partitions by user — millions of small
    partitions, no global sort — and the bigram space is |types|²,
    so the final aggregate is constant-size. Top-20 is a total order
    (cnt desc, then both labels) → TakeOrderedAndProject."""
    events = table(spark, sf_dir, "events", fan_out=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "prev_type", "next_type")
        .limit(20)
    )


# --- Brand co-occurrence lift ------------------------------------------------

_LIFT_ORACLE = """
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (SELECT COUNT(DISTINCT okey) AS n FROM ob),
    brand_n AS (SELECT brand, COUNT(*) AS bn FROM ob GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_cnt
        FROM ob a JOIN ob b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, pair_cnt,
           floor(CAST(pair_cnt AS DOUBLE) * n.n
                 / (CAST(na.bn AS DOUBLE) * nb.bn) * 1e6 + 0.5) / 1e6
               AS lift
    FROM pairs
    JOIN brand_n na ON na.brand = brand_a
    JOIN brand_n nb ON nb.brand = brand_b
    CROSS JOIN n_orders n
    ORDER BY pair_cnt DESC, brand_a, brand_b
    LIMIT 15
"""


@register("cooccurrence_lift", oracle=_LIFT_ORACLE)
def cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between part brands co-occurring in one
    order: lift(a,b) = P(ab)·N / (n_a·n_b). The self-join is keyed on
    l_orderkey, whose group size is bounded by order line-count (≤7
    in TPC-H shape) — per-key work is O(items²) with a small constant,
    NOT corpus-quadratic. Brand marginals (≤25 rows) and the order
    total broadcast onto the pair aggregate. The (order, brand) frame
    feeds FOUR consumers (marginals, total, both self-join sides), so
    it is materialized once — the SemDeDup/PageRank precedent; at
    100 TB this is "write the basket projection, then mine it"."""
    lineitem = table(spark, sf_dir, "lineitem", fan_out=False)
    part = table(spark, sf_dir, "part", fan_out=False)
    ob = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem.l_partkey == part.p_partkey,
        )
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = ob.agg(F.countDistinct("okey").alias("n"))
    brand_n = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("bn"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    na = brand_n.select(
        F.col("brand").alias("brand_a"), F.col("bn").alias("bn_a")
    )
    nb = brand_n.select(
        F.col("brand").alias("brand_b"), F.col("bn").alias("bn_b")
    )
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            qround(
                F.col("pair_cnt").cast("double")
                * F.col("n")
                / (F.col("bn_a").cast("double") * F.col("bn_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_cnt"), "brand_a", "brand_b")
        .limit(15)
    )


# --- k-anonymity audit -------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
    WITH qid AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
        FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS qid_groups,
           MIN(sz) AS k_min,
           CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
           CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT)
               AS records_below_k
    FROM qid GROUP BY c_mktsegment
"""


@register("k_anonymity_report", oracle=_KANON_ORACLE)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier (segment, nation): group
    sizes per QID combination, minimum k and the population exposed
    below k=5 — the privacy-side complement of the PII scan/redaction
    queries. Two aggregates over the same keys (the second is a
    rollup of the first's output, already partitioned compatibly —
    no extra wide shuffle)."""
    customer = table(spark, sf_dir, "customer", fan_out=False)
    qid = customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return qid.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("qid_groups"),
        F.min("sz").alias("k_min"),
        F.sum((F.col("sz") < _KANON_K).cast("long")).alias("groups_below_k"),
        F.sum(
            F.when(F.col("sz") < _KANON_K, F.col("sz")).otherwise(0)
        ).alias("records_below_k"),
    )
