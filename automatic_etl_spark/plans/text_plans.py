"""Oracle-checked plans for the text-analysis pack.

The DuckDB oracle SQL is GENERATED from the same constants
(``LANG_MARKERS`` etc.) that drive the Spark expressions, so the two
engines can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.functions import text as tx
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.sources.parquet import table

# --- SQL mirrors of functions/text.py ---------------------------------------


def _sql_token_count(col: str) -> str:
    # empty tokens dropped, mirroring functions/text.py tokens()
    return (
        f"len(list_filter(regexp_split_to_array(trim({col}), '\\s+'),"
        f" x -> x <> ''))"
    )


def _sql_marker_hit(col: str, word: str) -> str:
    return (
        f"CASE WHEN instr(' ' || lower({col}) || ' ', ' {word} ') > 0 "
        f"THEN 1 ELSE 0 END"
    )


def _sql_lang_score(col: str, lang: str) -> str:
    return " + ".join(_sql_marker_hit(col, w) for w in tx.LANG_MARKERS[lang])


def _sql_punct_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '[^\\w\\s]'))"


def _sql_lang_id_from_scores() -> str:
    """CASE over pre-computed score columns s_en..s_zh (see lang_id)."""
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in tx.LANG_ORDER) + ")"
    expr = "'unknown'"
    for lang in reversed(tx.LANG_ORDER):
        expr = (
            f"CASE WHEN s_{lang} > 0 AND s_{lang} = {best} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def _sql_quality_score(col: str) -> str:
    n_tok = f"CAST({_sql_token_count(col)} AS DOUBLE)"
    stop = f"CAST({_sql_lang_score(col, 'en')} AS DOUBLE)"
    punct = f"CAST({_sql_punct_count(col)} AS DOUBLE)"
    return (
        f"round(0.4 * least({n_tok} / 100.0, 1.0)"
        f" + 0.3 * ({stop} / 4.0)"
        f" + 0.3 * (1.0 - least({punct} / greatest({n_tok}, 1.0), 1.0)), 6)"
    )


_SQL_FINGERPRINT = (
    "substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)"
)


# --- token counting ----------------------------------------------------------


@register(
    "token_stats",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS doc_cnt,
               SUM({_sql_token_count('text')}) AS ws_tokens,
               SUM(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}')))
                   AS bpe_tokens,
               SUM(n_chars) AS total_chars
        FROM documents GROUP BY lang
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"),
        F.sum(tx.token_count("text")).alias("ws_tokens"),
        F.sum(tx.bpe_token_count("text")).alias("bpe_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


# --- language identification -------------------------------------------------


@register(
    "lang_id_confusion",
    oracle=f"""
        WITH scored AS (
            SELECT lang,
                   {", ".join(f"{_sql_lang_score('text', lang)} AS s_{lang}"
                              for lang in tx.LANG_ORDER)}
            FROM documents
        )
        SELECT lang, {_sql_lang_id_from_scores()} AS predicted,
               COUNT(*) AS cnt
        FROM scored GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", tx.lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("cnt"))
    )


# --- quality scoring ---------------------------------------------------------


@register(
    "quality_histogram",
    oracle=f"""
        WITH scored AS (
            SELECT source, {_sql_quality_score('text')} AS q FROM documents
        )
        SELECT source,
               CAST(floor(q * 10) AS BIGINT) AS bucket,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS q_total
        FROM scored GROUP BY 1, 2
    """,
)
def quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    q = tx.quality_score("text")
    return (
        docs.select("source", q.alias("q"))
        .groupBy(
            "source", F.floor(F.col("q") * 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("q").cast("decimal(18,6)")).cast("double").alias("q_total"),
        )
    )


# --- fingerprinting ----------------------------------------------------------
# Duplicate docs are constructed (every 10th doc re-appended under a
# shifted id) so the fingerprint groups are non-trivial.


@register(
    "fingerprint_stats",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text
            FROM documents WHERE doc_id % 10 = 0
        ), fp AS (
            SELECT doc_id, {_SQL_FINGERPRINT} AS fingerprint FROM corpus
        ), groups AS (
            SELECT fingerprint, COUNT(*) AS sz, MIN(doc_id) AS keeper
            FROM fp GROUP BY fingerprint
        )
        SELECT COUNT(*) AS distinct_docs,
               SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS dup_groups,
               SUM(sz - 1) AS removable_rows,
               SUM(keeper) AS keeper_id_total
        FROM groups
    """,
)
def fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    groups = (
        corpus.select(tx.doc_fingerprint("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("sz"), F.min("doc_id").alias("keeper"))
    )
    return groups.agg(
        F.count("*").alias("distinct_docs"),
        F.sum((F.col("sz") > 1).cast("int")).alias("dup_groups"),
        F.sum(F.col("sz") - 1).alias("removable_rows"),
        F.sum("keeper").alias("keeper_id_total"),
    )


# --- the curation funnel (end-to-end training-data pipeline) ----------------

QUALITY_THRESHOLD = 0.5


@register(
    "curation_funnel",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, lang, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, lang, text
            FROM documents WHERE doc_id % 10 = 0
        ),
        scored AS (
            SELECT doc_id, lang, text,
                   {_sql_quality_score('text')} AS q,
                   {_SQL_FINGERPRINT} AS fp
            FROM corpus
        ),
        quality AS (
            SELECT * FROM scored WHERE q >= {QUALITY_THRESHOLD}
        ),
        deduped AS (
            SELECT * FROM quality
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY doc_id ASC
            ) = 1
        )
        SELECT lang,
               COUNT(*) AS kept_docs,
               SUM({_sql_token_count('text')}) AS ws_tokens,
               SUM(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}')))
                   AS bpe_tokens,
               CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) AS quality_total
        FROM deduped GROUP BY lang
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation pipeline as ONE lazy plan:
    corpus (with planted duplicates) → quality-score filter → exact
    near-dup removal (fingerprint, keep lowest doc_id) → per-language
    token accounting. Scale shape: one scan, one window shuffle on the
    fingerprint, one final aggregation — the funnel never materializes
    intermediates."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "lang", "text"
    )
    corpus = docs.unionByName(planted)
    scored = corpus.select(
        "doc_id",
        "lang",
        "text",
        tx.quality_score("text").alias("q"),
        tx.doc_fingerprint("text").alias("fp"),
    ).filter(F.col("q") >= QUALITY_THRESHOLD)
    w = Window.partitionBy("fp").orderBy(F.asc("doc_id"))
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.sum(tx.token_count("text")).alias("ws_tokens"),
        F.sum(tx.bpe_token_count("text")).alias("bpe_tokens"),
        F.sum(F.col("q").cast("decimal(18,6)")).cast("double").alias(
            "quality_total"
        ),
    )
