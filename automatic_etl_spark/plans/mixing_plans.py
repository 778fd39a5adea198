"""Oracle-checked plans for training-corpus mixing and budget
planning: temperature-scaled source weighting, dedup-adjusted
("effective") token accounting, and the quality-vs-duplication
diagnostic.

These are the planning ops a 100 TB pretraining pipeline runs BEFORE
sampling: decide how much of each source to take (temperature mixing,
the Pile/PaLM data-weighting shape), know how much unique mass each
source actually has (exact-dup-adjusted tokens), and check whether
quality filtering and deduplication interact (low-quality strata are
usually duplicate-heavy — if not, one of the two signals is broken).

Float policy: per-term pow()/division results are rounded at ONE site
and summed as DECIMAL (the unigram_logprob_quality precedent), so
both engines aggregate identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.functions import text as tx
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.plans.text_plans import (
    _sql_quality_score,
    _sql_token_count,
)
from automatic_etl_spark.sources.parquet import table

# --- Temperature-scaled mixing allocation ------------------------------------

MIX_ALPHA = 0.7          # temperature: 1.0 = proportional, 0 = uniform
TOKEN_BUDGET = 1_000_000  # target training tokens (scaled-down stand-in)

_TEMPERATURE_ORACLE = f"""
    WITH per_source AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM({_sql_token_count('text')}) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    powed AS (
        SELECT source, n_docs, tokens,
               CAST(floor(pow(CAST(tokens AS DOUBLE), {MIX_ALPHA})
                          * 1e6 + 0.5) / 1e6
                    AS DECIMAL(28,6)) AS p
        FROM per_source
    ),
    tot AS (SELECT SUM(p) AS ptot FROM powed)
    SELECT source, n_docs, tokens,
           floor(CAST(p AS DOUBLE) / CAST(ptot AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS weight,
           CAST(round({TOKEN_BUDGET} * (floor(CAST(p AS DOUBLE)
                      / CAST(ptot AS DOUBLE) * 1e6 + 0.5) / 1e6)) AS BIGINT)
               AS allocated_tokens,
           floor(CAST(round({TOKEN_BUDGET} * (floor(CAST(p AS DOUBLE)
                      / CAST(ptot AS DOUBLE) * 1e6 + 0.5) / 1e6)) AS DOUBLE)
                 / tokens * 1e6 + 0.5) / 1e6 AS epochs
    FROM powed CROSS JOIN tot
"""


@register("temperature_mix_allocation", oracle=_TEMPERATURE_ORACLE)
def temperature_mix_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled source mixing (w_s ∝ tokens_s^α, α=0.7 — the
    multilingual/multi-domain upweighting used in Pile/PaLM-style data
    recipes): per source, the mixing weight, the token allocation
    against a budget, and the implied epoch count (allocation /
    available — >1 means the source repeats). One source-keyed
    aggregate (map-side combine over ≤|sources| keys) plus a broadcast
    1-row total; pow() is rounded at one site and summed as DECIMAL so
    both engines see identical doubles."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text")).cast("bigint").alias("tokens"),
    )
    powed = per_source.withColumn(
        "p",
        qround(F.pow(F.col("tokens").cast("double"), F.lit(MIX_ALPHA)))
        .cast("decimal(28,6)"),
    ).localCheckpoint(eager=True)
    tot = powed.agg(F.sum("p").alias("ptot"))
    weight = qround(
        F.col("p").cast("double") / F.col("ptot").cast("double")
    )
    # round-ok: scale-0 integer recovery — weight is qround'd to the
    # 1e-6 grid and TOKEN_BUDGET is 1e6, so budget×weight lands within
    # 1 ulp of an integer (0.5 margin); mirrored round() in the oracle.
    allocated = F.round(F.lit(TOKEN_BUDGET) * weight).cast("bigint")
    return powed.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        weight.alias("weight"),
        allocated.alias("allocated_tokens"),
        qround(
            allocated.cast("double") / F.col("tokens")
        ).alias("epochs"),
    )


# --- Dedup-adjusted effective tokens -----------------------------------------

_EFFECTIVE_ORACLE = f"""
    WITH uniq AS (
        SELECT source, md5(text) AS h,
               COUNT(*) AS copies,
               MIN(CAST({_sql_token_count('text')} AS BIGINT)) AS tok
        FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(SUM(copies) AS BIGINT) AS raw_docs,
           CAST(SUM(copies * tok) AS BIGINT) AS raw_tokens,
           COUNT(*) AS unique_docs,
           CAST(SUM(tok) AS BIGINT) AS unique_tokens,
           floor(CAST(SUM(copies * tok) AS DOUBLE) / SUM(tok)
                 * 1e6 + 0.5) / 1e6
               AS duplication_factor
    FROM uniq GROUP BY source
"""


@register("effective_token_report", oracle=_EFFECTIVE_ORACLE)
def effective_token_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-adjusted corpus accounting: raw vs UNIQUE token mass per
    source (each distinct text counted once), and the duplication
    factor — the number the mixing allocation above should divide by
    before promising epochs. Hash-groupBy on (source, md5(text)) —
    the exact-dedup shuffle shape, no pairwise anything — then a
    rollup on source over the already-partitioned frame. Token counts
    per copy are identical, so MIN(tok) == the per-text count on both
    engines."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    uniq = docs.groupBy(
        "source", tx.md5_hex("text").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("copies"),
        F.min(tx.token_count("text").cast("bigint")).alias("tok"),
    )
    return uniq.groupBy("source").agg(
        F.sum("copies").cast("bigint").alias("raw_docs"),
        F.sum(F.col("copies") * F.col("tok")).cast("bigint").alias(
            "raw_tokens"
        ),
        F.count(F.lit(1)).alias("unique_docs"),
        F.sum("tok").cast("bigint").alias("unique_tokens"),
        qround(
            F.sum(F.col("copies") * F.col("tok")).cast("double")
            / F.sum("tok")
        ).alias("duplication_factor"),
    )


# --- Quality vs duplication diagnostic ---------------------------------------

_QUALITY_DUP_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id, text,
               {_sql_quality_score('text')} AS q
        FROM documents
    ),
    dup AS (
        SELECT md5(text) AS h, COUNT(*) AS copies
        FROM documents GROUP BY md5(text)
    )
    SELECT CAST(floor(q * 10) AS BIGINT) AS quality_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_docs,
           floor(CAST(SUM(CASE WHEN d.copies > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS dup_rate
    FROM scored s JOIN dup d ON md5(s.text) = d.h
    GROUP BY quality_bucket
"""


@register("quality_dedup_correlation", oracle=_QUALITY_DUP_ORACLE)
def quality_dedup_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does low quality co-occur with duplication? Per equi-WIDTH
    quality bucket (bounded [0,1] score — bucketing needs NO global
    sort, unlike ntile/percent_rank which would total-order the
    corpus), the fraction of docs whose exact text occurs more than
    once. Two hash shuffles (text-hash dup counts; bucket rollup);
    the dup-count frame joins back on the hash key it was built on."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    scored = docs.select(
        "doc_id",
        tx.md5_hex("text").alias("h"),
        tx.quality_score("text").alias("q"),
    )
    dup = docs.groupBy(tx.md5_hex("text").alias("h")).agg(
        F.count(F.lit(1)).alias("copies")
    )
    return (
        scored.join(dup, "h")
        .groupBy(
            F.floor(F.col("q") * 10).cast("bigint").alias("quality_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("copies") > 1).cast("long")).cast("bigint").alias(
                "dup_docs"
            ),
            qround(
                F.sum((F.col("copies") > 1).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )
