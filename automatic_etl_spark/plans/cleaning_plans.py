"""Oracle-checked plans for the cleaning library (SURVEY.md §2.7).

Pattern: build a deterministic "dirty" column from fixture data inside
the query (both engines construct it identically), clean it with the
REAL library expressions on the Spark side, and encode the expected
semantics as CASE/try_cast SQL on the DuckDB side. This gives the
driver's value-hash gate full coverage of C1-C18 without bespoke
fixture files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.functions import cleaning as cl
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.plans.relational import dsum
from automatic_etl_spark.sources.parquet import table

_SENTINELS_SQL = ", ".join(f"'{s}'" for s in cl.NULL_SENTINELS + cl.ZERO_DATES)


# --- C1/C18: temporal sanitation --------------------------------------------


@register(
    "clean_dates",
    oracle=f"""
        WITH dirty AS (
            SELECT o_orderstatus,
                   CASE o_orderkey % 7
                     WHEN 0 THEN '0000-00-00'
                     WHEN 1 THEN ''
                     WHEN 2 THEN '1899-03-05'
                     WHEN 3 THEN '2150-01-01'
                     WHEN 4 THEN 'NULL'
                     WHEN 5 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                     ELSE strftime(o_orderdate, '%Y-%m-%d')
                   END AS s
            FROM orders
        ), cleaned AS (
            SELECT o_orderstatus,
                   CASE WHEN s IN ({_SENTINELS_SQL}) THEN NULL
                        WHEN year(TRY_CAST(s AS TIMESTAMP)) BETWEEN 1901 AND 2099
                        THEN TRY_CAST(s AS TIMESTAMP)
                   END AS ts
            FROM dirty
        )
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               CAST(SUM(CASE WHEN ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS valid_cnt,
               MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM cleaned GROUP BY o_orderstatus
    """,
)
def clean_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 7
    dirty = (
        F.when(k == 0, F.lit("0000-00-00"))
        .when(k == 1, F.lit(""))
        .when(k == 2, F.lit("1899-03-05"))
        .when(k == 3, F.lit("2150-01-01"))
        .when(k == 4, F.lit("NULL"))
        .when(k == 5, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    ts = cl.sanitize_dates(dirty)
    return (
        orders.select("o_orderstatus", ts.alias("ts"))
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("ts").isNull().cast("int")).alias("null_cnt"),
            F.sum(F.col("ts").isNotNull().cast("int")).alias("valid_cnt"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
    )


# --- C5/C6: integer cleaning -------------------------------------------------

_CLEAN_INT_SENTINELS = ", ".join(f"'{s}'" for s in cl.NULL_SENTINELS)


@register(
    "clean_integers",
    oracle=f"""
        WITH dirty AS (
            SELECT c_nationkey,
                   CASE c_custkey % 8
                     WHEN 0 THEN 'null'
                     WHEN 1 THEN 'NaN'
                     WHEN 2 THEN ''
                     WHEN 3 THEN 'na'
                     WHEN 4 THEN CAST(c_custkey AS VARCHAR) || '.0'
                     WHEN 5 THEN '12.7'
                     WHEN 6 THEN '99999999999999999999999'
                     ELSE CAST(c_custkey AS VARCHAR)
                   END AS s
            FROM customer
        ), gated AS (
            SELECT c_nationkey,
                   CASE WHEN trim(s) IN ({_CLEAN_INT_SENTINELS})
                        THEN NULL ELSE trim(s) END AS g
            FROM dirty
        ), cleaned AS (
            -- integer-literal strings parse DIRECTLY to BIGINT (the
            -- double round-trip corrupts > 2^53); only decimal forms
            -- take the double path with the floor gate
            SELECT c_nationkey,
                   CASE WHEN regexp_matches(g, '^[+-]?[0-9]+$')
                        THEN TRY_CAST(g AS BIGINT)
                        WHEN TRY_CAST(g AS DOUBLE)
                             = floor(TRY_CAST(g AS DOUBLE))
                        THEN TRY_CAST(TRY_CAST(g AS DOUBLE) AS BIGINT)
                   END AS v
            FROM gated
        )
        SELECT c_nationkey,
               CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(COALESCE(v, 0)) AS BIGINT) AS total_pk_filled
        FROM cleaned GROUP BY c_nationkey
    """,
)
def clean_integers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    k = F.col("c_custkey") % 8
    dirty = (
        F.when(k == 0, F.lit("null"))
        .when(k == 1, F.lit("NaN"))
        .when(k == 2, F.lit(""))
        .when(k == 3, F.lit("na"))
        .when(k == 4, F.concat(F.col("c_custkey").cast("string"), F.lit(".0")))
        .when(k == 5, F.lit("12.7"))
        .when(k == 6, F.lit("99999999999999999999999"))
        .otherwise(F.col("c_custkey").cast("string"))
    )
    v = cl.clean_integers(dirty)
    v_pk = cl.clean_integers(dirty, pk=True)
    return (
        customer.select("c_nationkey", v.alias("v"), v_pk.alias("v_pk"))
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("v").isNull().cast("int")).alias("null_cnt"),
            F.sum("v").alias("total"),
            F.sum("v_pk").alias("total_pk_filled"),
        )
    )


# --- C14: string normalization ----------------------------------------------


@register(
    "normalize_strings",
    oracle=rf"""
        WITH dirty AS (
            SELECT '  ' || c_name || chr(13) || chr(10) || chr(9)
                   || c_mktsegment || '   ' AS s
            FROM customer
        ), cleaned AS (
            SELECT NULLIF(trim(regexp_replace(regexp_replace(
                       s, '[\x00-\x1f\x7f-\x9f]', ' ', 'g'),
                       '{cl.UNICODE_WS_CLASS}+', ' ', 'g')), '') AS v
            FROM dirty
        )
        SELECT COUNT(*) AS row_cnt,
               COUNT(DISTINCT v) AS distinct_cnt,
               CAST(SUM(length(v)) AS BIGINT) AS total_len
        FROM cleaned
    """,
)
def normalize_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    dirty = F.concat(
        F.lit("  "),
        F.col("c_name"),
        F.lit("\r\n\t"),
        F.col("c_mktsegment"),
        F.lit("   "),
    )
    v = cl.normalize_strings(dirty)
    return customer.select(v.alias("v")).agg(
        F.count("*").alias("row_cnt"),
        F.countDistinct("v").alias("distinct_cnt"),
        F.sum(F.length("v")).alias("total_len"),
    )


# --- C12: mojibake repair ----------------------------------------------------


def _nested_replace_sql(inner: str) -> str:
    expr = inner
    for broken, fixed in cl.MOJIBAKE_REPAIRS:
        expr = f"replace({expr}, '{broken}', '{fixed}')"
    return expr


@register(
    "mojibake_repair",
    oracle=f"""
        WITH dirty AS (
            SELECT p_partkey,
                   replace(replace(p_name, 'a', 'Ã¡'), 'o', 'Ã³') AS s,
                   replace(replace(p_name, 'a', 'á'), 'o', 'ó') AS expected
            FROM part
        )
        SELECT CAST(SUM(CASE WHEN {_nested_replace_sql('s')} = expected
                        THEN 1 ELSE 0 END) AS BIGINT) AS repaired_cnt,
               COUNT(*) AS row_cnt,
               CAST(SUM(length({_nested_replace_sql('s')})) AS BIGINT) AS total_len
        FROM dirty
    """,
)
def mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    dirty = F.replace(
        F.replace(F.col("p_name"), F.lit("a"), F.lit("Ã¡")),
        F.lit("o"),
        F.lit("Ã³"),
    )
    expected = F.replace(
        F.replace(F.col("p_name"), F.lit("a"), F.lit("á")),
        F.lit("o"),
        F.lit("ó"),
    )
    repaired = cl.fix_mojibake(dirty)
    return part.select(
        repaired.alias("repaired"), expected.alias("expected")
    ).agg(
        F.sum((F.col("repaired") == F.col("expected")).cast("int")).alias(
            "repaired_cnt"
        ),
        F.count("*").alias("row_cnt"),
        F.sum(F.length("repaired")).alias("total_len"),
    )


# --- C4: time formatting -----------------------------------------------------


@register(
    "time_format",
    oracle=r"""
        WITH dirty AS (
            SELECT CASE event_id % 3
                     WHEN 0 THEN '0 days ' || strftime(ts, '%H:%M:%S')
                     WHEN 1 THEN strftime(ts, '%H:%M:%S')
                     ELSE 'not-a-time'
                   END AS s
            FROM events
        ), cleaned AS (
            SELECT NULLIF(regexp_extract(
                       s, '(\d{1,2}:\d{2}:\d{2})', 1), '') AS t
            FROM dirty
        )
        SELECT substr(t, 1, 2) AS hh,
               COUNT(*) AS cnt
        FROM cleaned GROUP BY 1
    """,
)
def time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    k = F.col("event_id") % 3
    dirty = (
        F.when(k == 0, F.concat(F.lit("0 days "), F.date_format("ts", "HH:mm:ss")))
        .when(k == 1, F.date_format("ts", "HH:mm:ss"))
        .otherwise(F.lit("not-a-time"))
    )
    t = cl.format_time(dirty)
    return (
        events.select(F.substring(t, 1, 2).alias("hh"))
        .groupBy("hh")
        .agg(F.count("*").alias("cnt"))
    )


# --- C7: numeric clamping ----------------------------------------------------


@register(
    "numeric_clamp",
    oracle="""
        SELECT c_mktsegment,
               (CAST(SUM(CAST(floor(greatest(least(c_acctbal, 127), -128)
                                    * 1e2 + 0.5) AS BIGINT))
                     AS DOUBLE) / 1e2) AS clamped_total,
               CAST(SUM(CASE WHEN c_acctbal > 127 OR c_acctbal < -128
                        THEN 1 ELSE 0 END) AS BIGINT) AS clamped_cnt
        FROM customer GROUP BY c_mktsegment
    """,
)
def numeric_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    clamped = cl.clamp_numeric(bal, "Int8")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            dsum(clamped, "clamped_total"),
            F.sum(((bal > 127) | (bal < -128)).cast("int")).alias("clamped_cnt"),
        )
    )


# --- C6: Int32 overflow guard ------------------------------------------------


@register(
    "overflow_guard",
    oracle="""
        WITH scaled AS (
            SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey
                        ELSE o_orderkey * 1000000000 END AS v
            FROM orders
        ), guarded AS (
            SELECT CASE WHEN v BETWEEN -2147483648 AND 2147483647
                        THEN v END AS v
            FROM scaled
        )
        SELECT CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS overflow_cnt,
               CAST(SUM(v) AS BIGINT) AS safe_total
        FROM guarded
    """,
)
def overflow_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    scaled = F.when(
        F.col("o_orderkey") % 2 == 0, F.col("o_orderkey")
    ).otherwise(F.col("o_orderkey") * 1000000000)
    guarded = cl.int32_overflow_guard(scaled)
    return orders.select(guarded.alias("v")).agg(
        F.sum(F.col("v").isNull().cast("int")).alias("overflow_cnt"),
        F.sum("v").alias("safe_total"),
    )


# --- C15: NOT-NULL default fill ----------------------------------------------


@register(
    "fill_defaults",
    oracle="""
        WITH dirty AS (
            SELECT CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_brand END AS b,
                   CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_size END AS sz
            FROM part
        )
        SELECT COALESCE(b, 'N/A') AS brand, COUNT(*) AS cnt,
               CAST(SUM(COALESCE(sz, 0)) AS BIGINT) AS size_total
        FROM dirty GROUP BY 1
    """,
)
def fill_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    b = F.when(F.col("p_partkey") % 5 != 0, F.col("p_brand"))
    sz = F.when(F.col("p_partkey") % 7 != 0, F.col("p_size"))
    return (
        part.select(
            cl.fill_not_null_default(b, "string", "brand").alias("brand"),
            cl.fill_not_null_default(sz, "integer", "size").alias("sz"),
        )
        .groupBy("brand")
        .agg(F.count("*").alias("cnt"), F.sum("sz").alias("size_total"))
    )


# --- §3.1 pipeline shape: schema-driven whole-table clean --------------------


@register(
    "clean_table_pipeline",
    oracle=f"""
        WITH dirty AS (
            SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'null'
                        ELSE CAST(o_orderkey AS VARCHAR) END AS id,
                   CASE WHEN o_orderkey % 11 = 0 THEN '0000-00-00'
                        ELSE strftime(o_orderdate, '%Y-%m-%d') END AS f,
                   '  ' || o_orderpriority || chr(9) || ' ' AS prio,
                   CASE WHEN o_orderkey % 9 = 0 THEN 'NaN'
                        ELSE CAST(o_totalprice AS VARCHAR) END AS price
            FROM orders
        ), cleaned AS (
            SELECT COALESCE(CASE WHEN trim(id) IN ({_CLEAN_INT_SENTINELS}) THEN NULL
                                 WHEN regexp_matches(trim(id), '^[+-]?[0-9]+$')
                                 THEN TRY_CAST(trim(id) AS BIGINT)
                                 WHEN TRY_CAST(id AS DOUBLE) = floor(TRY_CAST(id AS DOUBLE))
                                 THEN TRY_CAST(TRY_CAST(id AS DOUBLE) AS BIGINT) END,
                            0) AS id,
                   -- composed C1+C3 window: sanitize keeps years
                   -- [1901, 2099], then clamp_datetime_range's default
                   -- lo=1970-01-01 nulls anything earlier -> the net
                   -- keep window the Spark pipeline actually applies
                   -- is [1970, 2099]
                   CASE WHEN f IN ({_SENTINELS_SQL}) THEN NULL
                        WHEN year(TRY_CAST(f AS TIMESTAMP)) BETWEEN 1970 AND 2099
                        THEN TRY_CAST(f AS TIMESTAMP) END AS f,
                   -- string kind = normalize(fix_mojibake(.)): mirror
                   -- the repair chain innermost (no-op on this
                   -- fixture, load-bearing if priorities ever carry
                   -- mojibake pairs or '??')
                   NULLIF(trim(regexp_replace(regexp_replace(
                       {_nested_replace_sql('prio')},
                       '[\\x00-\\x1f\\x7f-\\x9f]', ' ', 'g'),
                       '\\s+', ' ', 'g')), '') AS prio,
                   CASE WHEN isnan(TRY_CAST(price AS DOUBLE))
                          OR TRY_CAST(price AS DOUBLE) = 'inf'::DOUBLE
                          OR TRY_CAST(price AS DOUBLE) = '-inf'::DOUBLE
                        THEN NULL ELSE TRY_CAST(price AS DOUBLE) END AS price
            FROM dirty
        )
        SELECT prio,
               CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pk_filled_cnt,
               CAST(SUM(id) AS BIGINT) AS id_total,
               CAST(SUM(CASE WHEN f IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS date_nulls,
               (CAST(SUM(CAST(floor((price) * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2) AS price_total
        FROM cleaned GROUP BY prio
    """,
)
def clean_table_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    dirty = orders.select(
        F.when(okey % 13 == 0, F.lit("null"))
        .otherwise(okey.cast("string"))
        .alias("id"),
        F.when(okey % 11 == 0, F.lit("0000-00-00"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("f"),
        F.concat(F.lit("  "), F.col("o_orderpriority"), F.lit("\t ")).alias(
            "prio"
        ),
        F.when(okey % 9 == 0, F.lit("NaN"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("price"),
    )
    specs = {
        "id": {"kind": "integer", "pk": True, "nullable": False},
        "f": {"kind": "temporal"},
        "prio": {"kind": "string"},
        "price": {"kind": "float"},
    }
    cleaned = cl.clean_table(dirty, specs)
    return cleaned.groupBy("prio").agg(
        F.sum((F.col("id") == 0).cast("int")).alias("pk_filled_cnt"),
        F.sum("id").alias("id_total"),
        F.sum(F.col("f").isNull().cast("int")).alias("date_nulls"),
        dsum("price", "price_total"),
    )


# --- C3: datetime range clamp (oracle upgrade) ------------------------------


@register(
    "clamp_dates",
    oracle="""
        WITH clamped AS (
            SELECT CASE WHEN ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
                                    AND TIMESTAMP '2024-01-22 23:59:59'
                        THEN ts END AS cts
            FROM events
        )
        SELECT COUNT(*) AS row_cnt,
               COUNT(cts) AS in_range_cnt,
               MIN(cts) AS min_kept,
               MAX(cts) AS max_kept
        FROM clamped
    """,
)
def clamp_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 over a narrow window so both kept and nulled rows exist."""
    events = table(spark, sf_dir, "events")
    cts = cl.clamp_datetime_range(
        "ts", lo="2024-01-08 00:00:00", hi="2024-01-22 23:59:59"
    )
    return events.select(cts.alias("cts")).agg(
        F.count("*").alias("row_cnt"),
        F.count("cts").alias("in_range_cnt"),
        F.min("cts").alias("min_kept"),
        F.max("cts").alias("max_kept"),
    )


# --- C11: binary → string decode (oracle upgrade) ---------------------------


@register(
    "decode_binary_roundtrip",
    oracle="""
        SELECT COUNT(*) AS cnt,
               COUNT(CASE WHEN length(text) > 0 THEN 1 END)
                   AS decoded_match_cnt,
               CAST(SUM(length(text)) AS BIGINT) AS char_total
        FROM documents
    """,
)
def decode_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 through the REAL pandas-UDF decode path: utf-8 encode the
    corpus to binary, decode via the detection/fallback chain, and
    prove the round trip is lossless (decoded == original for every
    row — ASCII/UTF-8 corpus)."""
    from automatic_etl_spark.functions.encoding import decode_binary

    docs = table(spark, sf_dir, "documents")
    # detect=False: the oracle assumes every row round-trips, and a
    # chardet statistical mis-guess (if the library ever appears in
    # the environment) would make the result model-version-dependent —
    # same reasoning encoding_fallback_chain documents.
    decoded = docs.select(
        "text",
        decode_binary(
            F.encode(F.col("text"), "UTF-8"), detect=False
        ).alias("decoded"),
    )
    return decoded.agg(
        F.count("*").alias("cnt"),
        F.count(F.when(F.col("decoded") == F.col("text"), 1)).alias(
            "decoded_match_cnt"
        ),
        F.sum(F.length("decoded")).alias("char_total"),
    )


# --- C13: encoding-detection fallback chain (oracle-checked subset) ---------


@register(
    "encoding_fallback_chain",
    oracle="""
        WITH expected AS (
            SELECT p_partkey,
                   CASE p_partkey % 3
                     WHEN 0 THEN p_name
                     WHEN 1 THEN p_name || chr(233) || chr(255)
                     ELSE chr(255) || chr(254) || p_name
                   END AS want
            FROM part
        )
        SELECT CAST(SUM(CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS utf8_cnt,
               CAST(SUM(CASE WHEN p_partkey % 3 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS latin1_cnt,
               COUNT(*) AS row_cnt,
               CAST(SUM(length(want)) AS BIGINT) AS decoded_len_total
        FROM expected
    """,
)
def encoding_fallback_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13's deterministic fallback chain through the REAL pandas UDF
    (detect=False): per row, craft bytes that exercise a different
    branch — valid UTF-8 (first step succeeds), a trailing lone 0xE9
    (invalid UTF-8 → latin-1 decodes it as U+00E9), and a leading
    0xFF 0xFE (invalid UTF-8 → latin-1 → U+00FF U+00FE). The oracle
    states the expected decoded text; the Spark side must decode to
    exactly that for the aggregate to match (reference
    tools/data_cleaner_robust.py:67-123).
    """
    from automatic_etl_spark.functions.encoding import decode_binary

    part_t = table(spark, sf_dir, "part")
    k = F.col("p_partkey") % 3
    raw = (
        F.when(k == 0, F.encode(F.col("p_name"), "UTF-8"))
        .when(
            k == 1,
            F.concat(F.encode(F.col("p_name"), "UTF-8"), F.unhex(F.lit("E9FF"))),
        )
        .otherwise(
            F.concat(F.unhex(F.lit("FFFE")), F.encode(F.col("p_name"), "UTF-8"))
        )
    )
    expected = (
        F.when(k == 0, F.col("p_name"))
        .when(k == 1, F.concat(F.col("p_name"), F.char(F.lit(233)), F.char(F.lit(255))))
        .otherwise(F.concat(F.char(F.lit(255)), F.char(F.lit(254)), F.col("p_name")))
    )
    decoded = part_t.select(
        "p_partkey",
        decode_binary(raw, detect=False).alias("got"),
        expected.alias("want"),
    )
    matched = F.col("got") == F.col("want")
    return decoded.agg(
        F.sum(((F.col("p_partkey") % 3 == 0) & matched).cast("int")).alias(
            "utf8_cnt"
        ),
        F.sum(((F.col("p_partkey") % 3 != 0) & matched).cast("int")).alias(
            "latin1_cnt"
        ),
        F.count("*").alias("row_cnt"),
        F.sum(F.length("got")).alias("decoded_len_total"),
    )


# --- C16: numeric type inference applied end-to-end -------------------------


@register(
    "infer_and_cast",
    oracle="""
        WITH dirty AS (
            SELECT CAST(l_linenumber AS VARCHAR) AS n_str,
                   CAST(l_extendedprice AS VARCHAR) AS price_str,
                   l_returnflag AS flag_str
            FROM lineitem
        )
        SELECT COUNT(*) AS cnt,
               CAST(SUM(TRY_CAST(n_str AS BIGINT)) AS BIGINT) AS n_total,
               (CAST(SUM(CAST(floor(TRY_CAST(price_str AS DOUBLE)
                                    * 1e2 + 0.5) AS BIGINT))
                     AS DOUBLE) / 1e2) AS price_total,
               COUNT(DISTINCT flag_str) AS flag_distinct
        FROM dirty
    """,
)
def infer_and_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16 end-to-end: stringify typed columns, run the one-pass
    aggregate type probe (`infer_numeric_types`), assert the inferred
    kinds, apply the casts, and aggregate through them."""
    from automatic_etl_spark.sources.schema import infer_numeric_types

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_linenumber").cast("string").alias("n_str"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
        F.col("l_returnflag").alias("flag_str"),
    )
    inferred = infer_numeric_types(li)
    assert inferred == {
        "n_str": "long",
        "price_str": "double",
        "flag_str": "string",
    }, inferred
    typed = li.select(
        *[F.col(c).try_cast(t).alias(c) for c, t in inferred.items()]
    )
    return typed.agg(
        F.count("*").alias("cnt"),
        F.sum("n_str").alias("n_total"),
        (F.sum(F.floor((F.col("price_str")) * F.lit(1e2) + F.lit(0.5)).cast("long")).cast("double") / F.lit(1e2))
        .alias("price_total"),
        F.countDistinct("flag_str").alias("flag_distinct"),
    )


# --- C9: bool → int (oracle-checked; was unit-only through round 3) ----------


@register(
    "bool_to_int_agg",
    oracle="""
        SELECT event_type,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase_flags,
               CAST(COUNT(CASE WHEN event_type <> 'error'
                               THEN 1 END) AS BIGINT) AS non_null_flags
        FROM events GROUP BY event_type
    """,
)
def bool_to_int_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 live: a planted boolean column (NULL for 'error' rows) runs
    through bool_to_int; the aggregate pins true→1, false→0, and
    NULL→NULL passthrough."""
    events = table(spark, sf_dir, "events")
    flag = F.when(
        F.col("event_type") != "error", F.col("event_type") == "purchase"
    )
    ints = events.select(
        "event_type", cl.bool_to_int(flag).alias("flag_int")
    )
    return ints.groupBy("event_type").agg(
        F.coalesce(F.sum("flag_int"), F.lit(0)).alias("purchase_flags"),
        F.count("flag_int").alias("non_null_flags"),
    )


# --- C10: decimal fidelity (oracle-checked) ----------------------------------


@register(
    "decimal_fidelity_agg",
    oracle="""
        SELECT l_returnflag,
               CAST(pc // 100 AS VARCHAR) || '.' ||
                   LPAD(CAST(pc % 100 AS VARCHAR), 2, '0') AS price_total,
               CAST(dc // 10000 AS VARCHAR) || '.' ||
                   LPAD(CAST(dc % 10000 AS VARCHAR), 4, '0') AS discount_total
        FROM (
            SELECT l_returnflag,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS pc,
                   SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS dc
            FROM lineitem GROUP BY l_returnflag
        )
    """,
)
def decimal_fidelity_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 live: money aggregation in exact scaled integers (cents /
    basis points) end to end — the fidelity contract the reference
    loses by round-tripping through pandas floats (reference
    tools/ingest_runner.py:1444-1445).

    Two cross-engine pins, each closing a real divergence channel:
    the double→fixed-point rounding is ONE explicit IEEE expression
    (``floor(x*100 + 0.5)``) evaluated identically by both engines —
    never an engine-default decimal cast, whose tie rounding is
    HALF_UP in Spark but unpinned across DuckDB versions; and the
    result is rendered as a canonical fixed-point string via integer
    div/mod, because DECIMAL-typed output was the one column type the
    r4 driver hash canonicalized differently per engine (this was the
    only decimal-emitting query of 143 and the only red row, with
    rows/schema matching and the same values passing fetchall-level
    compare locally at the driver's own scale)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("pc"),
        F.sum(
            F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
        ).alias("dc"),
    )
    return agg.select(
        "l_returnflag",
        F.concat(
            F.expr("pc DIV 100").cast("string"),
            F.lit("."),
            F.lpad(F.pmod("pc", F.lit(100)).cast("string"), 2, "0"),
        ).alias("price_total"),
        F.concat(
            F.expr("dc DIV 10000").cast("string"),
            F.lit("."),
            F.lpad(F.pmod("dc", F.lit(10000)).cast("string"), 4, "0"),
        ).alias("discount_total"),
    )


# --- C10 escalation: beyond-int64 money sums (r10) ----------------------------
# dsum's BIGINT micro-units hold to ~9.2e18 micros per group — about
# 10^13 2-dp money rows. Past that, the documented escalation path
# (COVERAGE.md r9) is exact DECIMAL(38,0)/HUGEINT accumulation of the
# SAME per-row BIGINT micros, rendered as a canonical fixed-point
# string (never DecimalType output, never a double). This query
# executes that path for real at every tested SF by scaling each row's
# micros by a planted 10^5 factor: at sf0.01 the per-flag totals reach
# ~5e20 — far beyond int64 — so the wide accumulator is load-bearing,
# not decorative (under the driver's ANSI session a broken escalation
# would raise on overflow rather than silently wrap).

ESCALATION_MULT = 100_000  # stands in for ~10^13-row groups at test SF


@register(
    "money_sum_decimal_escalation",
    oracle=f"""
        SELECT l_returnflag, n_rows,
               CAST(t // 1000000 AS VARCHAR) || '.' ||
                   LPAD(CAST(t % 1000000 AS VARCHAR), 6, '0')
                   AS scaled_total
        FROM (
            SELECT l_returnflag,
                   COUNT(*) AS n_rows,
                   SUM(CAST(FLOOR(l_extendedprice * 1e6 + 0.5) AS HUGEINT)
                       * {ESCALATION_MULT}) AS t
            FROM lineitem GROUP BY l_returnflag
        )
    """,
)
def money_sum_decimal_escalation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dsum overflow-escalation path as tested code: per-row
    micros stay the pinned IEEE floor(x*1e6 + 0.5) BIGINT, the
    accumulator widens to DECIMAL(38,0) (DuckDB: HUGEINT — internal
    types may differ, the CANONICAL STRING is the contract), and the
    render is integer DIV/MOD — the decimal_fidelity_agg idiom at a
    magnitude where the int64 fast path cannot reach. At 100 TB this
    is the shape money sums take once a group exceeds ~10^13 rows."""
    li = table(spark, sf_dir, "lineitem")
    micros = (
        F.floor(F.col("l_extendedprice") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        * F.lit(ESCALATION_MULT)
    ).cast("decimal(38,0)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(micros).alias("t"),
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        F.concat(
            F.expr("t DIV 1000000").cast("string"),
            F.lit("."),
            F.lpad(F.pmod("t", F.lit(1000000)).cast("long").cast("string"), 6, "0"),
        ).alias("scaled_total"),
    )


# --- try_* error-safe arithmetic under ANSI (r6) ------------------------------
# The driver session runs ANSI mode ON (Spark 4 default): plain
# division-by-zero, integer overflow, and bad numeric parses THROW.
# The production-safe idiom is the try_* family — null-on-error with
# the error class preserved semantics — and this query exercises all
# three against deterministic hazards: denom = cents % 7 (zero ~1/7),
# a multiplier sized so cents >= 6 overflows int64 (5x lands 2 below int64max), and an 'N/A'
# poisoned numeric string every third row. The oracle reproduces the
# null masks arithmetically (the hazard conditions), proving try_*
# nulls exactly the hazardous rows and nothing else.

OVERFLOW_MULT = 1_844_674_407_370_955_161  # 5x fits int64 (…805), 6x overflows


@register(
    "try_arithmetic_surface",
    oracle=f"""
        WITH base AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        x AS (
            SELECT event_type, cents,
                   cents % 7 AS denom,
                   CASE WHEN event_id % 3 = 0 THEN 'N/A'
                        ELSE CAST(cents AS VARCHAR) END AS s
            FROM base
        )
        SELECT event_type,
               COUNT(*) AS rows_n,
               COUNT(*) FILTER (WHERE denom = 0) AS div_nulls,
               (CAST(SUM(CASE WHEN denom <> 0 THEN CAST(floor(
                        cents / CAST(denom AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) END) AS DOUBLE) / 1e6) AS ratio_total,
               COUNT(*) FILTER (WHERE cents > 5) AS overflow_nulls,
               COUNT(*) FILTER (WHERE s = 'N/A') AS parse_nulls,
               CAST(SUM(TRY_CAST(NULLIF(s, 'N/A') AS BIGINT)) AS BIGINT)
                   AS parsed_total
        FROM x GROUP BY event_type
    """,
)
def try_arithmetic_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide / try_multiply / try_to_number against planted
    hazards under ANSI mode: the null masks must match the hazard
    conditions exactly (division by zero, int64 overflow at
    cents >= 6, poisoned numeric strings)."""
    base = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    x = base.select(
        "event_type",
        "cents",
        (F.col("cents") % 7).alias("denom"),
        F.when(F.col("event_id") % 3 == 0, F.lit("N/A"))
        .otherwise(F.col("cents").cast("string"))
        .alias("s"),
    ).select(
        "event_type",
        "cents",
        "denom",
        "s",
        F.try_divide(F.col("cents").cast("double"), F.col("denom")).alias(
            "ratio"
        ),
        F.try_multiply(F.col("cents"), F.lit(OVERFLOW_MULT)).alias("ov"),
        # 18 digits: the format must cover any floor(value*100) the
        # fixture can produce at ANY scale factor — a 6-digit cap
        # would silently null 7-digit cents in Spark while the
        # oracle's uncapped TRY_CAST parses them.
        F.try_to_number(F.col("s"), F.lit("9" * 18)).alias("parsed"),
    )
    return x.groupBy("event_type").agg(
        F.count("*").alias("rows_n"),
        F.sum((F.col("denom") == 0).cast("long")).alias("div_nulls"),
        (F.sum(F.floor(F.col("ratio") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("ratio_total"),
        F.sum(
            (F.col("ov").isNull() & F.col("cents").isNotNull()).cast("long")
        ).alias("overflow_nulls"),
        F.sum(
            (F.col("parsed").isNull() & F.col("s").isNotNull()).cast("long")
        ).alias("parse_nulls"),
        F.sum("parsed").cast("long").alias("parsed_total"),
    )


# --- DQ metric drift between epochs (r6) --------------------------------------
# Deequ's second half is anomaly detection: compare each data-quality
# metric against its history and flag drift. Batch-shaped here: the
# corpus splits into two epochs at the MEDIAN event timestamp
# (value-compressed type-1 median over epoch-ms — deterministic on
# both engines, no fixture date hardcoded), per-epoch metrics compute
# in one conditional-aggregate pass each, and the report emits
# per-metric (epoch_a, epoch_b, drift_pct). Scale: two scans with
# map-side combine + a 1-row median broadcast; metric count is fixed,
# so the report is O(1) rows regardless of corpus size.


def _sql_epoch_median() -> str:
    return """
        vc AS (
            SELECT epoch_ms(ts) AS v, COUNT(*) AS c FROM events
            WHERE ts IS NOT NULL GROUP BY 1
        ),
        cum AS (
            SELECT v, SUM(c) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cc,
                   SUM(c) OVER () AS n
            FROM vc
        ),
        med AS (
            SELECT MIN(CASE WHEN cc >= (n + 1) // 2 THEN v END) AS m
            FROM cum
        )
    """


@register(
    "dq_metric_drift",
    oracle=f"""
        WITH {_sql_epoch_median()},
        tagged AS (
            SELECT CASE WHEN epoch_ms(e.ts) <= med.m THEN 0 ELSE 1 END
                       AS epoch,
                   e.value, e.user_id
            FROM events e CROSS JOIN med
        ),
        metrics AS (
            SELECT epoch,
                   COUNT(*) AS row_cnt,
                   COUNT(*) FILTER (WHERE value IS NULL) AS null_value,
                   COUNT(*) FILTER (WHERE value > 100.0) AS value_above_100,
                   COUNT(DISTINCT user_id) AS distinct_users
            FROM tagged GROUP BY epoch
        ),
        long_form AS (
            SELECT epoch, 'row_cnt' AS metric, row_cnt AS val FROM metrics
            UNION ALL
            SELECT epoch, 'null_value', null_value FROM metrics
            UNION ALL
            SELECT epoch, 'value_above_100', value_above_100 FROM metrics
            UNION ALL
            SELECT epoch, 'distinct_users', distinct_users FROM metrics
        )
        SELECT a.metric,
               CAST(a.val AS BIGINT) AS epoch_a,
               CAST(b.val AS BIGINT) AS epoch_b,
               floor(abs(b.val - a.val)
                     / CAST(GREATEST(a.val, 1) AS DOUBLE)
                     * 1e6 + 0.5) / 1e6 AS drift_ratio
        FROM (SELECT * FROM long_form WHERE epoch = 0) a
        JOIN (SELECT * FROM long_form WHERE epoch = 1) b USING (metric)
    """,
)
def dq_metric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric drift between the two median-split epochs of
    ``events``: (metric, epoch_a, epoch_b, drift_ratio). The epoch
    boundary is the type-1 median of epoch-ms (selected, not
    computed), so the split is engine-exact; drift is an integer
    ratio rounded once."""
    from automatic_etl_spark.operators import quantiles as qt

    ev = table(spark, sf_dir, "events", fan_out=False).select(
        F.unix_millis("ts").alias("ms"), "value", "user_id"
    )
    med = (
        qt.grouped_type1_quantiles(
            ev.select(F.lit(1).alias("g"), "ms"), "g", "ms",
            {"m": (1, 2)},
        )
        .select("m")
    )
    tagged = ev.crossJoin(F.broadcast(med)).select(
        F.when(F.col("ms") <= F.col("m"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("epoch"),
        "value",
        "user_id",
    )
    metrics = tagged.groupBy("epoch").agg(
        F.count("*").alias("row_cnt"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
        F.sum((F.col("value") > 100.0).cast("long")).alias(
            "value_above_100"
        ),
        F.countDistinct("user_id").alias("distinct_users"),
    )
    long_form = metrics.selectExpr(
        "epoch",
        "stack(4, 'row_cnt', row_cnt, 'null_value', null_value, "
        "'value_above_100', value_above_100, "
        "'distinct_users', distinct_users) AS (metric, val)",
    )
    a = long_form.filter(F.col("epoch") == 0).select(
        "metric", F.col("val").alias("epoch_a")
    )
    b = long_form.filter(F.col("epoch") == 1).select(
        "metric", F.col("val").alias("epoch_b")
    )
    return a.join(b, "metric").select(
        "metric",
        "epoch_a",
        "epoch_b",
        qround(
            F.abs(F.col("epoch_b") - F.col("epoch_a"))
            / F.greatest(F.col("epoch_a"), F.lit(1)).cast("double")
        ).alias("drift_ratio"),
    )
