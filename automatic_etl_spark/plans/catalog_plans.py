"""Catalog / set-operation plans (SURVEY.md §2.6 extension space +
§2.11): INTERSECT / EXCEPT, top-tables-by-size (O2), and the Q2
column profiler in long format."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators.profile import profile_columns
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table


# --- INTERSECT / EXCEPT (absent from the reference; free in Spark) ----------


@register(
    "set_ops",
    oracle="""
        WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        both_side AS (SELECT k FROM buyers INTERSECT SELECT k FROM rich),
        only_rich AS (SELECT k FROM rich EXCEPT SELECT k FROM buyers)
        SELECT 'intersect' AS op, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS key_total
        FROM both_side
        UNION ALL
        SELECT 'except' AS op, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS key_total
        FROM only_rich
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    rich = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count("*").alias("cnt"),
            F.sum("k").alias("key_total"),
        )

    return summarize(buyers.intersect(rich), "intersect").unionByName(
        summarize(rich.subtract(buyers), "except")
    )


# --- O2: top tables by size (catalog scan analog) ---------------------------
# (reference tools/pipeline_status.py:228 — ORDER BY total_rows DESC)


@register(
    "top_tables_by_size",
    oracle="""
        SELECT name, total_rows FROM (
            SELECT 'lineitem' AS name, COUNT(*) AS total_rows FROM lineitem
            UNION ALL SELECT 'orders', COUNT(*) FROM orders
            UNION ALL SELECT 'customer', COUNT(*) FROM customer
            UNION ALL SELECT 'part', COUNT(*) FROM part
            UNION ALL SELECT 'events', COUNT(*) FROM events
            UNION ALL SELECT 'documents', COUNT(*) FROM documents
        ) ORDER BY total_rows DESC, name ASC
    """,
)
def top_tables_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ("lineitem", "orders", "customer", "part", "events", "documents")
    counts = None
    for name in names:
        # fan_out=False: a COUNT(*) directly on the scan answers from
        # parquet footer metadata; the fan-out repartition would force
        # full row materialization + a shuffle per table (count_star
        # documents the same rule).
        branch = table(spark, sf_dir, name, fan_out=False).agg(
            F.lit(name).alias("name"), F.count("*").alias("total_rows")
        )
        counts = branch if counts is None else counts.unionByName(branch)
    return counts.orderBy(F.desc("total_rows"), F.asc("name"))


# --- Q2 long-format profile --------------------------------------------------


@register(
    "profile_customer",
    oracle="""
        SELECT 'c_custkey' AS "column",
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               COUNT(DISTINCT c_custkey) AS distinct_cnt,
               CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
               CAST(MAX(c_custkey) AS VARCHAR) AS max_value
        FROM customer
        UNION ALL
        SELECT 'c_mktsegment',
               CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT c_mktsegment),
               CAST(MIN(c_mktsegment) AS VARCHAR),
               CAST(MAX(c_mktsegment) AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT 'c_nationkey',
               CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT c_nationkey),
               CAST(MIN(c_nationkey) AS VARCHAR),
               CAST(MAX(c_nationkey) AS VARCHAR)
        FROM customer
    """,
)
def profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    return profile_columns(
        customer, ["c_custkey", "c_mktsegment", "c_nationkey"]
    )


# --- Q3: df.observe ride-along cleaning counters -----------------------------
# NaN is PLANTED into value (event_id % 13), clean_floats nulls it, and
# the observation reports rows + nulled count with NO second scan — the
# metrics ride the same action that computes the cents aggregate.


@register(
    "cleaning_observe_stats",
    oracle="""
        SELECT COUNT(*) AS rows,
               CAST(SUM(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS value_nulls,
               CAST(SUM(CASE WHEN event_id % 13 <> 0
                             THEN CAST(floor(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_total
        FROM events
    """,
)
def cleaning_observe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 end-to-end: the cleaning pipeline's counters come from
    ``df.observe`` attached to the SAME action that produces the
    business aggregate — at 100 TB this is the difference between one
    scan and two."""
    from automatic_etl_spark.functions.cleaning import clean_floats
    from automatic_etl_spark.operators.profile import observed_cleaning_stats

    events = table(spark, sf_dir, "events")
    planted = events.withColumn(
        "value",
        F.when(F.col("event_id") % 13 == 0, F.lit(float("nan"))).otherwise(
            F.col("value")
        ),
    )
    cleaned = planted.withColumn("value", clean_floats("value"))
    observed, obs = observed_cleaning_stats(cleaned, ["value"])
    cents = observed.agg(
        F.coalesce(
            F.sum(F.floor(F.col("value") * 100)), F.lit(0)
        ).alias("cents_total")
    ).first()[0]
    metrics = obs.get  # populated by the action above
    return spark.createDataFrame(
        [(metrics["rows"], metrics["value_nulls"], int(cents))],
        "rows long, value_nulls long, cents_total long",
    )


# --- Q4: usefulness classification over the whole warehouse ------------------

_NUMERIC_DUCK_TYPES = (
    "'BIGINT','INTEGER','DOUBLE','FLOAT','SMALLINT','TINYINT','HUGEINT'"
)


def _sql_usefulness(tables: tuple[str, ...]) -> str:
    parts = [
        f"""
        SELECT '{t}' AS table_name,
               (SELECT COUNT(*) FROM {t}) AS rows,
               (SELECT COUNT(*) FROM {t}) >= 1 AS useful,
               (SELECT COUNT(*) FROM (DESCRIBE SELECT * FROM {t}) d
                WHERE d.column_type IN ({_NUMERIC_DUCK_TYPES})
                   OR d.column_type LIKE 'DECIMAL%') AS numeric_cols
        """
        for t in tables
    ]
    return " UNION ALL ".join(parts)


@register(
    "usefulness_classification",
    oracle=_sql_usefulness(
        (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    ),
)
def usefulness_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 over every fixture table: emptiness + numeric-column census
    (reference tools/identify_useful_tables.py:40-90). Counts come from
    parquet footer statistics — cheap even at warehouse scale. The
    oracle recomputes column types via DESCRIBE, so fixture schema
    drift shows up as a mismatch, not a stale hardcode."""
    from automatic_etl_spark.operators.profile import usefulness_report
    from automatic_etl_spark.sources.parquet import TABLES, load_tables

    report = usefulness_report(
        load_tables(spark, sf_dir, TABLES, fan_out=False)
    )
    return spark.createDataFrame(
        [
            (r["table"], r["rows"], r["useful"], r["numeric_cols"])
            for r in report
        ],
        "table_name string, rows long, useful boolean, numeric_cols int",
    )


# --- D1 + S14: DDL synthesis applied idempotently, then read back ------------


@register(
    "ddl_apply_roundtrip",
    oracle="""
        SELECT COUNT(*) AS cnt,
               CAST(SUM(c_custkey) AS BIGINT) AS key_total,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS acctbal_total
        FROM customer
    """,
)
def ddl_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/S14 live: synthesize CREATE TABLE from the fixture schema,
    apply it TWICE (IF NOT EXISTS must no-op), load via INSERT INTO
    ... SELECT, and aggregate through the catalog table. Proves the
    generated DDL round-trips data exactly."""
    import uuid

    from automatic_etl_spark.operators.ddl import TableLayout, create_table_sql
    from automatic_etl_spark.scratch import scratch_dir

    cust = table(spark, sf_dir, "customer")
    name = f"ddl_rt_{uuid.uuid4().hex[:8]}"
    # Fixed per-(process, site) LOCATION, cleared at call start: DROP
    # TABLE on an external-LOCATION table removes only catalog
    # metadata, so a fresh mkdtemp per call stranded the inserted
    # parquet on disk (the storage_plans dpo_audit precedent). The pid
    # component in scratch_dir keeps concurrent processes from
    # deleting each other's live table data.
    loc = scratch_dir("ddl_rt")
    ddl = create_table_sql(
        name,
        cust.schema,
        TableLayout("default", sort_columns=("c_custkey",)),
        location=loc,
    )
    view = f"src_{name}"
    try:
        spark.sql(ddl)
        spark.sql(ddl)  # S14: idempotent re-apply
        cust.createOrReplaceTempView(view)
        spark.sql(f"INSERT INTO {name} SELECT * FROM {view}")
        result = spark.table(name).agg(
            F.count("*").alias("cnt"),
            F.sum("c_custkey").alias("key_total"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("acctbal_total"),
        )
        rows = result.collect()  # materialize before dropping the table
        return spark.createDataFrame(rows, result.schema)
    finally:
        # Repeated in-session runs (bench warm+measure, partition
        # sweeps) must not accumulate catalog/warehouse residue —
        # mirror catalog_cleanup_report's scratch-database drop.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.catalog.dropTempView(view)


# --- T9/Q5: source validation gate across the warehouse ----------------------


@register(
    "source_validation_report",
    oracle="""
        SELECT 'region' AS source, true AS ok,
               (SELECT COUNT(*) FROM (DESCRIBE SELECT * FROM region))
                   AS n_cols
        UNION ALL
        SELECT 'events', true,
               (SELECT COUNT(*) FROM (DESCRIBE SELECT * FROM events))
        UNION ALL
        SELECT 'documents', true,
               (SELECT COUNT(*) FROM (DESCRIBE SELECT * FROM documents))
        UNION ALL
        SELECT 'missing_table', false, 0
    """,
)
def source_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9/Q5 live: probe a set of sources (lazy factories — the probe
    collects ONE row each, the reference's SELECT-1 health check), and
    report per-source status. A deliberately missing table must come
    back ok=false with the error contained, never raised — per-source
    isolation is what lets a 500-table ingest continue past one broken
    grant."""
    from automatic_etl_spark.operators.profile import validate_source

    probes = {
        "region": lambda: table(spark, sf_dir, "region"),
        "events": lambda: table(spark, sf_dir, "events"),
        "documents": lambda: table(spark, sf_dir, "documents"),
        "missing_table": lambda: table(spark, sf_dir, "missing_table"),
    }
    rows = []
    for name, factory in probes.items():
        r = validate_source(factory)
        rows.append((name, r["ok"], len(r["columns"])))
    return spark.createDataFrame(
        rows, "source string, ok boolean, n_cols long"
    )


# --- D7 + D8: database bootstrap + usefulness-threshold cleanup --------------


@register(
    "catalog_cleanup_report",
    oracle="""
        SELECT 'keep_customer' AS table_name,
               (SELECT COUNT(*) FROM customer) >= 10 AS kept
        UNION ALL
        SELECT 'keep_pattern_tiny', true
        UNION ALL
        SELECT 'drop_tiny',
               (SELECT COUNT(*) FROM (SELECT * FROM lineitem LIMIT 3)) >= 10
    """,
)
def catalog_cleanup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7/D8 live: bootstrap a database, create three tables (a real
    fixture copy, a tiny one protected by a keep-pattern, a tiny one
    not protected), run the usefulness cleanup, and report which
    survived. The keep-pattern table proves the guard; the oracle
    derives keep/drop from the same row counts."""
    import uuid

    from automatic_etl_spark.operators.ddl import (
        bootstrap_databases,
        cleanup_catalog,
    )

    conn = f"conn{uuid.uuid4().hex[:8]}"
    db = bootstrap_databases(spark, [conn])[0]
    try:
        cust = table(spark, sf_dir, "customer")
        li = table(spark, sf_dir, "lineitem").limit(3)
        cust.write.saveAsTable(f"{db}.keep_customer")
        li.write.saveAsTable(f"{db}.keep_pattern_tiny")
        li.write.saveAsTable(f"{db}.drop_tiny")
        cleanup_catalog(
            spark, db, min_rows=10, keep_patterns=(r"^keep_pattern",)
        )
        survivors = {
            t.name for t in spark.catalog.listTables(db) if not t.isTemporary
        }
    finally:
        # finally, not post-hoc: a failure mid-plan must not strand the
        # scratch database + a full customer copy in spark-warehouse
        # ("repeated runs leave no warehouse residue" is the contract).
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    return spark.createDataFrame(
        [
            ("keep_customer", "keep_customer" in survivors),
            ("keep_pattern_tiny", "keep_pattern_tiny" in survivors),
            ("drop_tiny", "drop_tiny" in survivors),
        ],
        "table_name string, kept boolean",
    )


# --- D2/D3 layout chooser + Q6 orchestration status (oracle-checked) ---------


@register(
    "layout_chooser_report",
    oracle="""
        SELECT * FROM (VALUES
            ('user_events_log', 'log', 'ts', false),
            ('catalogo_tipos', 'reference', NULL, true),
            ('plain_facts', 'default', NULL, false)
        ) AS t(table_name, table_kind, partition_column, upsert)
    """,
)
def layout_chooser_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3 heuristics over the real events schema: log-named tables
    month-partition on their temporal column, reference-named tables
    upsert (ReplacingMergeTree analog), everything else is a plain
    sorted table (reference tools/create_clickhouse_models.py
    heuristics)."""
    from automatic_etl_spark.operators.ddl import choose_layout

    schema = table(spark, sf_dir, "events").schema
    rows = []
    for name in ("user_events_log", "catalogo_tipos", "plain_facts"):
        lay = choose_layout(name, schema, ("event_id",))
        rows.append((name, lay.table_kind, lay.partition_column, lay.upsert))
    return spark.createDataFrame(
        rows,
        "table_name string, table_kind string, partition_column string, "
        "upsert boolean",
    )


@register(
    "pipeline_status_report",
    oracle="""
        SELECT * FROM (VALUES
            ('overall', 'success', CAST(1 AS BIGINT)),
            ('discover', 'success', CAST(1 AS BIGINT)),
            ('flaky_ingest', 'success', CAST(2 AS BIGINT)),
            ('blocked_views', 'success', CAST(1 AS BIGINT))
        ) AS t(phase, status, attempts)
    """,
)
def pipeline_status_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 live: a 3-phase DAG where the middle phase fails once with a
    recoverable error and succeeds on retry; the status report must
    show attempts=2 for it, success overall, and the dependent phase
    run after it (reference tools/ingest_runner.py:2250-2268 status
    JSON)."""
    from automatic_etl_spark.orchestrator import (
        Orchestrator,
        Phase,
        RecoverableError,
        status_report,
    )

    state = {"failures": 0}

    def flaky(_ctx):
        if state["failures"] == 0:
            state["failures"] += 1
            raise RecoverableError("transient connection loss")
        return "ok"

    results = (
        Orchestrator()
        .add(Phase("discover", lambda _ctx: ["events"]))
        .add(Phase("flaky_ingest", flaky, depends_on=("discover",)))
        .add(
            Phase(
                "blocked_views", lambda _ctx: True, depends_on=("flaky_ingest",)
            )
        )
        .run()
    )
    report = status_report(results)
    rows = [
        ("overall", "success" if report["success"] else "failed", 1)
    ] + [
        (name, p["status"], p["attempts"])
        for name, p in report["phases"].items()
    ]
    return spark.createDataFrame(rows, "phase string, status string, attempts long")


# --- S1/S11 live: JDBC write → chunked partitioned scan → aggregate ----------


def _drop_memory_derby(spark: SparkSession, dbname: str) -> None:
    """Free an in-memory Derby database. Derby signals a successful
    ``drop=true`` by RAISING SQLException 08006, so the except is the
    success path, not error suppression."""
    try:
        spark._jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{dbname};drop=true"
        )
    except Exception:  # noqa: BLE001 — 08006 == dropped
        pass


@register(
    "jdbc_roundtrip_agg",
    oracle="""
        SELECT COUNT(*) AS cnt,
               CAST(SUM(c_custkey) AS BIGINT) AS key_total,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS acctbal_total
        FROM customer
    """,
)
def jdbc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S11 against a REAL JDBC database: the fixture customer table
    goes out through the engine's JDBC sink into embedded Apache Derby
    (the in-sandbox stand-in for MySQL) and comes back through the
    chunked scan path — 4 range partitions on the PK, the reference's
    50k-chunk pattern (tools/ingest_runner.py:1475). The aggregate
    over the JDBC read must equal the aggregate over the original
    parquet — the full out-and-back fidelity check."""
    import uuid

    from automatic_etl_spark.sources import jdbc

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    lo, hi = cust.agg(
        F.min("c_custkey"), F.max("c_custkey")
    ).first()
    # memory: Derby — still the embedded engine and the same JDBC wire
    # contract, but no on-disk database directory per invocation (a
    # fresh mkdtemp per call leaked a customer copy per bench run).
    # ONE fixed db name, dropped at call START (scratch_dir pattern):
    # the returned frame stays a LIVE partitioned JDBC scan — a
    # collect-and-drop would reduce the plan to a local scan and make
    # the fingerprint/PLANS row vacuous — and at most one customer
    # copy ever lives in JVM memory.
    dbname = "jdbc_rt_scratch"
    _drop_memory_derby(spark, dbname)
    src = jdbc.JdbcSource(
        url=f"jdbc:derby:memory:{dbname};create=true",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )
    jdbc.write_table(cust, src, "customer_rt", mode="append", batchsize=500)
    back = jdbc.read_table(
        spark,
        src,
        "customer_rt",
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    return back.agg(
        F.count("*").alias("cnt"),
        F.sum("c_custkey").alias("key_total"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("acctbal_total"),
    )


# --- S3: live column/PK/nullability reflection (was unit-only through r4) ----


@register(
    "reflect_to_struct",
    oracle="""
        SELECT * FROM (VALUES
            ('id', 'bigint', false, true),
            ('name', 'string', true, false),
            ('bal', 'decimal(12,2)', true, false),
            ('created', 'timestamp', true, false),
            ('qty', 'int', false, false)
        ) AS t(col_name, spark_type, nullable, primary_key)
    """,
)
def reflect_to_struct_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 against a REAL JDBC database: create a Derby table with a
    primary key and mixed nullability, reflect columns / PK /
    nullability through live JDBC metadata (DatabaseMetaData — what the
    reference's DESCRIBE + information_schema + PK probe reads;
    tools/ingest_runner.py:1420-1471, gen_pipeline.py:58-81), feed the
    reflected rows through the engine's ``reflect_to_struct`` type map,
    and cross-check the resulting StructType against the schema Spark
    itself resolves for the same table over JDBC. Metadata-only
    driver-side probe — no row data moves."""
    import uuid

    from automatic_etl_spark.sources import jdbc
    from automatic_etl_spark.sources.schema import reflect_to_struct

    dbname = f"refl_{uuid.uuid4().hex[:8]}"
    url = f"jdbc:derby:memory:{dbname};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.createStatement().executeUpdate(
            "CREATE TABLE CUSTOMER_REFL ("
            "ID BIGINT NOT NULL PRIMARY KEY, NAME VARCHAR(50), "
            "BAL DECIMAL(12,2), CREATED TIMESTAMP, QTY INT NOT NULL)"
        )
        md = conn.getMetaData()
        rs = md.getPrimaryKeys(None, None, "CUSTOMER_REFL")
        pks = set()
        while rs.next():
            pks.add(rs.getString("COLUMN_NAME").lower())
        cols, rs = [], md.getColumns(None, None, "CUSTOMER_REFL", None)
        while rs.next():  # ordered by ORDINAL_POSITION per JDBC spec
            name = rs.getString("COLUMN_NAME").lower()
            typ = rs.getString("TYPE_NAME").lower()
            if typ == "decimal":
                typ += f"({rs.getInt('COLUMN_SIZE')},{rs.getInt('DECIMAL_DIGITS')})"
            cols.append(
                {
                    "name": name,
                    "mysql_type": typ,
                    "nullable": rs.getInt("NULLABLE") == 1,
                    "primary_key": name in pks,
                }
            )
    finally:
        conn.close()
    struct = reflect_to_struct(cols)
    src = jdbc.JdbcSource(
        url=url, driver="org.apache.derby.iapi.jdbc.AutoloadedDriver"
    )
    spark_view = {
        f.name.lower(): f.dataType.simpleString()
        for f in jdbc.read_table(spark, src, "CUSTOMER_REFL").schema.fields
    }
    for f in struct.fields:  # two independent reflections must agree
        assert spark_view[f.name] == f.dataType.simpleString(), (
            f.name, spark_view[f.name], f.dataType.simpleString()
        )
    _drop_memory_derby(spark, dbname)  # rows below are already Python
    return spark.createDataFrame(
        [
            (f.name, f.dataType.simpleString(), f.nullable,
             c["primary_key"])
            for f, c in zip(struct.fields, cols)
        ],
        "col_name string, spark_type string, nullable boolean, "
        "primary_key boolean",
    )


# --- Self-repair loop: failed ingest → fix schemas → retry once --------------


@register(
    "self_repair_pipeline",
    oracle="""
        SELECT 'success' AS status, CAST(2 AS BIGINT) AS attempts,
               true AS repaired,
               COUNT(*) AS cnt,
               CAST(SUM(c_custkey) AS BIGINT) AS key_total,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS acctbal_total
        FROM customer
    """,
)
def self_repair_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's self-repair composition live (reference
    tools/multi_database_ingest.py:173-219): an ingest phase fails on
    a real schema mismatch (target table is missing a column the
    source carries), the phase's repair hook evolves the target schema
    (ALTER TABLE ADD COLUMNS — the Spark analog of the reference's
    fix-schemas pass), and the orchestrator grants exactly one retry,
    which succeeds. The aggregate over the repaired table must equal
    the aggregate over the source — repair loses no data — and the
    status row pins attempts=2 / repaired=true."""
    import uuid

    from automatic_etl_spark.orchestrator import Orchestrator, Phase
    from automatic_etl_spark.scratch import scratch_dir

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    name = f"repair_rt_{uuid.uuid4().hex[:8]}"
    view = f"src_{name}"
    # fixed per-(process, site) LOCATION, cleared at call start (DROP
    # TABLE on an external table leaves its parquet behind — see
    # ddl_apply; pid component isolates concurrent processes)
    loc = scratch_dir("repair_rt")

    def ingest(_ctx):
        spark.sql(f"INSERT INTO {name} SELECT * FROM {view}")
        return True

    def fix_schema(_ctx, err):
        if "column" not in err.lower() and "target table" not in err.lower():
            return False  # only schema drift is repairable here
        spark.sql(f"ALTER TABLE {name} ADD COLUMNS (c_acctbal DOUBLE)")
        return True

    try:
        # Target created WITHOUT c_acctbal — the planted schema drift.
        spark.sql(
            f"CREATE TABLE {name} (c_custkey BIGINT, c_name STRING) "
            f"USING parquet LOCATION '{loc}'"
        )
        cust.createOrReplaceTempView(view)
        results = (
            Orchestrator()
            .add(Phase("ingest", ingest, max_retries=1, repair=fix_schema))
            .run()
        )
        r = results["ingest"]
        agg = spark.table(name).agg(
            F.count("*").alias("cnt"),
            F.sum("c_custkey").alias("key_total"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("acctbal_total"),
        ).first()
        return spark.createDataFrame(
            [(r.status, r.attempts, r.repaired,
              agg["cnt"], agg["key_total"], agg["acctbal_total"])],
            "status string, attempts long, repaired boolean, cnt long, "
            "key_total long, acctbal_total double",
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.catalog.dropTempView(view)
