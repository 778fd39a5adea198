"""Oracle-checked plans for the LLM-training-data curation suite:
near-dup canonicalization (pair → cluster → survivor), PII scanning,
URL/domain profiling, repetition scoring, and quantized-embedding
recall.

These extend the reference's dedup/cleaning intent (keep-one-per-key,
tools/ingest_runner.py:1576-1588; column sanitation, ingest_runner.py
cleaning stages) to the curation stages a 100 TB pretraining pipeline
runs between crawl and tokenizer. Everything is pure Column
expressions or shuffle-bounded joins — no Python on the data path —
and every plan has a step-for-step DuckDB mirror built from the same
constants.

The near-dup corpus plants CHAINS (base → +suffix → +longer suffix)
so the pair graph has real transitive structure: pairwise output alone
cannot pick survivors; connected components can.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.functions import text as tx
from automatic_etl_spark.operators import text_dedup as td
from automatic_etl_spark.operators.graph import connected_components
from automatic_etl_spark.plans.dedup_plans import (
    PLANT_OFFSET,
    _BAND_MATCH,
    _SQL_JACCARD,
    _SQL_SHINGLES,
    _SQL_SIGNATURES,
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    ROWS_PER_BAND,
)
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.sources.parquet import table

# Chain planting: copy1 extends the base by 3 tokens, copy2 by 6 — all
# three pairwise Jaccards clear the threshold on fixture-length docs,
# so each planted group forms one component {d, d+1M, d+2M}.
CHAIN_SUFFIX_1 = " zyx wvu tsr"
CHAIN_SUFFIX_2 = " zyx wvu tsr qpo nml kji"


def _chain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_id < PLANT_OFFSET clamp: see dedup_plans.PLANT_OFFSET — the
    # planted id spaces must stay collision-free at any table size.
    docs = (
        table(spark, sf_dir, "documents", fan_out=False)
        .select("doc_id", "text", "lang")
        .filter(F.col("doc_id") < PLANT_OFFSET)
    )
    base = docs.filter(F.col("doc_id") % 5 == 0)
    copy1 = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(CHAIN_SUFFIX_1)).alias("text"),
        "lang",
    )
    copy2 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2 * PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(CHAIN_SUFFIX_2)).alias("text"),
        "lang",
    )
    return base.unionByName(copy1).unionByName(copy2)


_SQL_CHAIN_CORPUS = f"""
        corpus AS (
            SELECT doc_id, text, lang FROM documents
            WHERE doc_id % 5 = 0 AND doc_id < {PLANT_OFFSET}
            UNION ALL
            SELECT doc_id + {PLANT_OFFSET}, text || '{CHAIN_SUFFIX_1}', lang
            FROM documents WHERE doc_id % 10 = 0 AND doc_id < {PLANT_OFFSET}
            UNION ALL
            SELECT doc_id + {2 * PLANT_OFFSET}, text || '{CHAIN_SUFFIX_2}', lang
            FROM documents WHERE doc_id % 20 = 0 AND doc_id < {PLANT_OFFSET}
        )
"""

# Shared prefix: corpus → shingles → signatures → LSH candidates →
# Jaccard-verified edges (a_id < b_id). Reused by the components CTE
# below and the triangle-count oracle.
_SQL_EDGE_CHAIN = f"""
        {_SQL_CHAIN_CORPUS},
        {_SQL_SHINGLES},
        {_SQL_SIGNATURES},
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM sig a JOIN sig b
              ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
        ),
        {_SQL_JACCARD},
        edges AS (
            SELECT jac.a_id, jac.b_id FROM jac
            JOIN cand ON jac.a_id = cand.a_id AND jac.b_id = cand.b_id
            WHERE jac.jaccard >= {JACCARD_THRESHOLD}
        )
"""

# The recursion computes reachability (node, reachable-from) and takes
# MIN per node — exactly the fixpoint the Spark-side label propagation
# converges to.
_SQL_COMPONENTS = f"""
        {_SQL_EDGE_CHAIN},
        sym AS (
            SELECT a_id AS src, b_id AS dst FROM edges
            UNION
            SELECT b_id, a_id FROM edges
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS r FROM corpus
            UNION
            SELECT s.dst, reach.r FROM reach JOIN sym s ON reach.node = s.src
        ),
        comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
"""


def _near_dup_edges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(corpus, verified edge list a_id < b_id) — the shared front of
    every near-dup graph query (Spark mirror of _SQL_EDGE_CHAIN)."""
    corpus = _chain_corpus(spark, sf_dir)
    # One materialization of the shingle frame (r14): signatures, both
    # jaccard_pairs probe sides, and the size aggregate otherwise each
    # re-run scan→tokenize→interpreted-HOF-shingle→explode (guide
    # §1.2; interleaved A/B at sf0.1: median 5.98→5.46 s on
    # near_dup_canonical).
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    # row-form signatures (r10): codegen'd hashing, ~1-row/doc exchange
    # (see dedup_plans.minhash_lsh_dedup for the honest-scale A/B that
    # reversed the r8 map-side choice)
    signatures = td.minhash_signatures(sh, NUM_HASHES)
    candidates = td.lsh_candidate_pairs(signatures, BANDS, ROWS_PER_BAND)
    edges = (
        td.jaccard_pairs(sh, candidates=candidates)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id")
    )
    return corpus, edges


def _near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, component) over the chain corpus — LSH pairs verified by
    candidate-driven Jaccard, then min-label propagation."""
    corpus, edges = _near_dup_edges(spark, sf_dir)
    return connected_components(corpus.select("doc_id"), edges)


@register(
    "dedup_connected_components",
    oracle=f"""
        WITH RECURSIVE {_SQL_COMPONENTS},
        csizes AS (
            SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
        )
        SELECT COUNT(*) AS n_components,
               CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS multi_components,
               MAX(sz) AS largest_component,
               CAST(SUM(sz) AS BIGINT) AS n_docs,
               CAST(SUM(component) AS BIGINT) AS component_id_total
        FROM csizes
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over Jaccard-verified LSH pairs: the planted
    chains {d, d+1M, d+2M} must collapse into single components, and
    unpaired docs must stay singletons. component_id_total pins the
    labeling itself (min doc_id per cluster), not just the shape."""
    comp = _near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_components"),
        F.sum((F.col("sz") > 1).cast("int")).alias("multi_components"),
        F.max("sz").alias("largest_component"),
        F.sum("sz").alias("n_docs"),
        F.sum("component").alias("component_id_total"),
    )


@register(
    "dedup_cc_pointer_doubling",
    oracle=f"""
        WITH RECURSIVE {_SQL_COMPONENTS},
        csizes AS (
            SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
        )
        SELECT COUNT(*) AS n_components,
               CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS multi_components,
               MAX(sz) AS largest_component,
               CAST(SUM(sz) AS BIGINT) AS n_docs,
               CAST(SUM(component) AS BIGINT) AS component_id_total
        FROM csizes
    """,
)
def dedup_cc_pointer_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same components as `dedup_connected_components`, computed with
    the hook+compress (pointer-jumping) variant: O(log diameter)
    rounds instead of O(diameter) — the scale path when dup clusters
    are long chains rather than tight cliques (operators/graph.py
    `compress=True`; Shiloach-Vishkin). Same oracle because the output
    contract is identical — the two algorithms must agree exactly."""
    corpus, edges = _near_dup_edges(spark, sf_dir)
    comp = connected_components(
        corpus.select("doc_id"), edges, compress=True
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").alias("n_components"),
        F.sum((F.col("sz") > 1).cast("int")).alias("multi_components"),
        F.max("sz").alias("largest_component"),
        F.sum("sz").alias("n_docs"),
        F.sum("component").alias("component_id_total"),
    )


@register(
    "near_dup_canonical",
    oracle=f"""
        WITH RECURSIVE {_SQL_COMPONENTS}
        SELECT c.lang,
               COUNT(*) AS total_cnt,
               CAST(SUM(CASE WHEN comp.node = comp.component
                             THEN 1 ELSE 0 END) AS BIGINT) AS kept_cnt,
               CAST(SUM(CASE WHEN comp.node <> comp.component
                             THEN 1 ELSE 0 END) AS BIGINT) AS removed_cnt,
               CAST(SUM(CASE WHEN comp.node = comp.component
                             THEN comp.node ELSE 0 END) AS BIGINT)
                   AS keeper_id_total
        FROM comp JOIN corpus c ON comp.node = c.doc_id
        GROUP BY c.lang
    """,
)
def near_dup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after clustering: keep ONE survivor per component (the
    W1 keep-smallest-id policy applied to clusters — the component
    label IS the survivor id), drop the rest. keeper_id_total proves
    the exact survivor set, per language."""
    comp = _near_dup_components(spark, sf_dir)
    corpus = _chain_corpus(spark, sf_dir).select(
        F.col("doc_id").alias("node"), "lang"
    )
    return (
        comp.join(corpus, "node")
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_cnt"),
            F.sum((F.col("node") == F.col("component")).cast("int")).alias(
                "kept_cnt"
            ),
            F.sum((F.col("node") != F.col("component")).cast("int")).alias(
                "removed_cnt"
            ),
            F.sum(
                F.when(F.col("node") == F.col("component"), F.col("node"))
                .otherwise(F.lit(0))
            ).alias("keeper_id_total"),
        )
    )


# --- PII scan ----------------------------------------------------------------
# Patterns are RE2 ∩ Java-regex compatible (character classes, \\b, \\d,
# bounded repetition only). The fixture text carries no PII, so each
# type is PLANTED deterministically by doc_id residue — the scan must
# find exactly the planted instances.

PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

_SQL_PII_PLANT = """
        planted AS (
            SELECT doc_id, lang,
                   text || CASE doc_id % 11
                       WHEN 0 THEN ' user' || CAST(doc_id AS VARCHAR)
                                   || '@mail.example.com'
                       WHEN 1 THEN ' call 555-867-5309'
                       WHEN 2 THEN ' ssn 123-45-6789'
                       WHEN 3 THEN ' host 10.1.2.3 up'
                       ELSE ''
                   END AS text
            FROM documents
        )
"""


def _pii_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out=False: both consumers (pii_scan_stats, pii_redaction)
    # run codegen regex projections + a tiny aggregate — no
    # interpreted per-row work that would need the fixture fan-out.
    docs = table(spark, sf_dir, "documents", fan_out=False)
    extra = (
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com"),
            ),
        )
        .when(F.col("doc_id") % 11 == 1, F.lit(" call 555-867-5309"))
        .when(F.col("doc_id") % 11 == 2, F.lit(" ssn 123-45-6789"))
        .when(F.col("doc_id") % 11 == 3, F.lit(" host 10.1.2.3 up"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id", "lang", F.concat(F.col("text"), extra).alias("text")
    )


@register(
    "pii_scan_stats",
    oracle=f"""
        WITH {_SQL_PII_PLANT}
        SELECT lang,
               COUNT(*) AS docs,
               {", ".join(
                   f'''CAST(SUM(CASE WHEN len(regexp_extract_all(text,
                           '{pat}')) > 0 THEN 1 ELSE 0 END) AS BIGINT)
                           AS {name}_docs,
                       CAST(SUM(len(regexp_extract_all(text, '{pat}')))
                           AS BIGINT) AS {name}_hits'''
                   for name, pat in PII_PATTERNS.items()
               )},
               CAST(SUM(CASE WHEN {" OR ".join(
                   f"len(regexp_extract_all(text, '{pat}')) > 0"
                   for pat in PII_PATTERNS.values()
               )} THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs
        FROM planted GROUP BY lang
    """,
)
def pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-stage PII scan: per-language doc and hit counts for
    each pattern class plus the any-PII flag rate. One projection, one
    groupBy — the regexes run inside codegen, so at 100 TB this is a
    pure map-side scan with a tiny aggregate."""
    planted = _pii_planted(spark, sf_dir)
    counts = {
        name: F.regexp_count("text", F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }
    aggs: list = []
    for name in PII_PATTERNS:
        aggs.append(
            F.sum((F.col(f"{name}_cnt") > 0).cast("int")).alias(f"{name}_docs")
        )
        aggs.append(F.sum(f"{name}_cnt").alias(f"{name}_hits"))
    flagged = None
    for name in PII_PATTERNS:
        hit = F.col(f"{name}_cnt") > 0
        flagged = hit if flagged is None else (flagged | hit)
    return (
        planted.select(
            "lang",
            *[cnt.alias(f"{name}_cnt") for name, cnt in counts.items()],
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            *aggs,
            F.sum(flagged.cast("int")).alias("flagged_docs"),
        )
    )


# --- URL / domain profiling --------------------------------------------------

URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"^https?://([^/]+)"

_SQL_URL_PLANT = """
        planted AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                       THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                            || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                       ELSE '' END
                   || CASE WHEN doc_id % 9 = 0
                       THEN ' and http://cdn.example.org/asset'
                       ELSE '' END AS text
            FROM documents
        )
"""


@register(
    "url_domain_stats",
    oracle=f"""
        WITH {_SQL_URL_PLANT},
        urls AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '{URL_PATTERN}')) AS url
            FROM planted
        )
        SELECT regexp_extract(url, '{DOMAIN_PATTERN}', 1) AS domain,
               COUNT(*) AS url_cnt,
               COUNT(DISTINCT doc_id) AS doc_cnt
        FROM urls GROUP BY 1
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + domain rollup — the provenance/blocklist stage
    of a crawl pipeline. regexp_extract_all explodes matches (a doc can
    carry many URLs); the domain aggregate is one shuffle with map-side
    combine. At 100 TB the domain key set is small (web power law), so
    AQE's skew handling covers the fat head domains."""
    docs = table(spark, sf_dir, "documents")
    extra1 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.lit(""))
    extra2 = F.when(
        F.col("doc_id") % 9 == 0, F.lit(" and http://cdn.example.org/asset")
    ).otherwise(F.lit(""))
    planted = docs.select(
        "doc_id", F.concat(F.col("text"), extra1, extra2).alias("text")
    )
    urls = planted.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(URL_PATTERN), 0)
        ).alias("url"),
    )
    return urls.select(
        "doc_id", F.regexp_extract("url", DOMAIN_PATTERN, 1).alias("domain")
    ).groupBy("domain").agg(
        F.count("*").alias("url_cnt"),
        F.countDistinct("doc_id").alias("doc_cnt"),
    )


# --- Repetition scoring ------------------------------------------------------

_SQL_BIGRAMS = """
        toks AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang,
                   list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1]) AS g
            FROM toks WHERE len(t) >= 2
        )
"""


@register(
    "repetition_stats",
    oracle=f"""
        WITH {_SQL_BIGRAMS},
        scored AS (
            SELECT lang,
                   floor((len(g) - len(list_distinct(g)))
                         / CAST(len(g) AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS rep_ratio
            FROM grams
        )
        SELECT lang,
               COUNT(*) AS doc_cnt,
               CAST(SUM(CASE WHEN rep_ratio > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS repeated_docs,
               (CAST(SUM(CAST(floor((rep_ratio) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS rep_ratio_total,
               MAX(rep_ratio) AS rep_ratio_max
        FROM scored GROUP BY lang
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram fraction per doc (1 − distinct/total), rolled
    up per language — the standard degenerate-text signal (boilerplate,
    keyboard mash, model loops score high). Entirely array expressions
    inside codegen: no explode, no extra shuffle beyond the final tiny
    groupBy."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    g = tx.word_ngrams("text", 2)
    scored = docs.select(
        "lang",
        qround(
            (F.size(g) - F.size(F.array_distinct(g)))
            / F.size(g).cast("double")
        ).alias("rep_ratio"),
    ).filter(F.size(g) >= 1)
    return scored.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"),
        F.sum((F.col("rep_ratio") > 0).cast("int")).alias("repeated_docs"),
        (F.sum(F.floor((F.col("rep_ratio")) * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("rep_ratio_total"),
        F.max("rep_ratio").alias("rep_ratio_max"),
    )


@register(
    "top_bigram_fraction",
    oracle=f"""
        WITH {_SQL_BIGRAMS},
        bg AS (SELECT doc_id, lang, unnest(g) AS bigram FROM grams),
        cnts AS (
            SELECT doc_id, lang, bigram, COUNT(*) AS c
            FROM bg GROUP BY 1, 2, 3
        ),
        per_doc AS (
            SELECT doc_id, lang,
                   floor(MAX(c) / CAST(SUM(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS frac
            FROM cnts GROUP BY 1, 2
        )
        SELECT lang,
               COUNT(*) AS doc_cnt,
               (CAST(SUM(CAST(floor((frac) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6) AS frac_total,
               MAX(frac) AS frac_max
        FROM per_doc GROUP BY lang
    """,
)
def top_bigram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc occupied by its single most frequent
    bigram (Gopher-style repetition filter). Explode → two-level
    aggregate, both with map-side combines; the (doc, bigram) shuffle
    key is near-unique so no skew."""
    docs = table(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", "lang", F.explode(tx.word_ngrams("text", 2)).alias("bigram")
    )
    per_doc = (
        bg.groupBy("doc_id", "lang", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "lang")
        .agg(
            qround(
                F.max("c") / F.sum("c").cast("double")
            ).alias("frac")
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"),
        (F.sum(F.floor((F.col("frac")) * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("frac_total"),
        F.max("frac").alias("frac_max"),
    )


# --- Benchmark n-gram decontamination ----------------------------------------
# The train/eval overlap scan every serious pretraining pipeline runs:
# any training doc sharing an n-gram with the held-out benchmark set is
# flagged. Benchmark docs = doc_id % 97 == 0; a fixed 6-token sentence
# is planted into the benchmark docs AND into every train doc with
# doc_id % 50 == 1, so a known subset MUST be flagged (natural
# collisions on top are fine — both engines see the same corpus).

DECON_N = 5
BENCH_MOD = 97
PLANT_MOD = 50
PLANT_SENTENCE = " alpha bravo charlie delta echo foxtrot"

_SQL_DECON_GRAMS = f"""
        docs2 AS (
            SELECT doc_id, lang,
                   text || CASE WHEN doc_id % {BENCH_MOD} = 0
                                  OR doc_id % {PLANT_MOD} = 1
                               THEN '{PLANT_SENTENCE}' ELSE '' END AS text
            FROM documents
        ),
        toks AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x <> '') AS t
            FROM docs2
        ),
        grams AS (
            SELECT DISTINCT doc_id, lang,
                   unnest(list_transform(
                       generate_series(1, len(t) - {DECON_N - 1}),
                       i -> {" || ' ' || ".join(f"t[i+{j}]" if j else "t[i]"
                                                for j in range(DECON_N))}
                   )) AS gram
            FROM toks
        )
"""


@register(
    "ngram_decontaminate",
    oracle=f"""
        WITH {_SQL_DECON_GRAMS},
        bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCH_MOD} = 0
        ),
        train AS (SELECT * FROM grams WHERE doc_id % {BENCH_MOD} <> 0),
        hits AS (
            SELECT DISTINCT t.doc_id, t.lang
            FROM train t JOIN bench b ON t.gram = b.gram
        )
        SELECT d.lang,
               COUNT(*) AS train_docs,
               COUNT(h.doc_id) AS contaminated_docs,
               CAST(COALESCE(SUM(h.doc_id), 0) AS BIGINT)
                   AS contaminated_id_total
        FROM (SELECT doc_id, lang FROM docs2
              WHERE doc_id % {BENCH_MOD} <> 0) d
        LEFT JOIN hits h ON d.doc_id = h.doc_id
        GROUP BY d.lang
    """,
)
def ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any {DECON_N}-gram with the benchmark
    set. Scale shape: the benchmark gram set is small relative to the
    corpus (eval suites are tiny) → broadcast semi-join, so the train
    side never shuffles; here Spark's planner picks broadcast because
    the bench side is under the 64 MB threshold. The planted sentence
    guarantees non-trivial flagged rows."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    planted = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                (F.col("doc_id") % BENCH_MOD == 0)
                | (F.col("doc_id") % PLANT_MOD == 1),
                F.lit(PLANT_SENTENCE),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    grams = planted.select(
        "doc_id", "lang", F.explode(tx.shingles("text", DECON_N)).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    )
    train_grams = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = (
        train_grams.join(bench, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_docs = planted.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", "lang"
    )
    return (
        train_docs.join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("train_docs"),
            F.count("hit").alias("contaminated_docs"),
            F.coalesce(
                F.sum(F.when(F.col("hit") == 1, F.col("doc_id"))), F.lit(0)
            ).alias("contaminated_id_total"),
        )
    )


# --- Unigram-LM quality scoring ----------------------------------------------


@register(
    "unigram_logprob_quality",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '')) AS tok
            FROM documents
        ),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        total AS (SELECT SUM(cnt) AS n FROM vocab),
        scored AS (
            -- per-token surprisal quantized STRAIGHT to integer
            -- micro-units via the pinned IEEE floor(x*1e6+0.5) idiom
            -- (r8 advice): native round(ln(...),6) was the same
            -- half-boundary class one level below the mean.
            SELECT t.doc_id, t.lang,
                   CAST(floor(ln(CAST(total.n AS DOUBLE) / v.cnt)
                              * 1e6 + 0.5) AS BIGINT) AS surprisal_micros
            FROM toks t JOIN vocab v ON t.tok = v.tok CROSS JOIN total
        ),
        per_doc AS (
            -- exact integer micro-units: round-half-up of the EXACT
            -- rational mean via (2p+q) // (2q). round() on the double
            -- quotient diverges between engines at representation
            -- boundaries (caught by the r8 sf0.1 oracle sweep).
            SELECT doc_id, lang,
                   (2 * SUM(surprisal_micros)
                      + COUNT(*)) // (2 * COUNT(*)) AS avg_micros
            FROM scored GROUP BY doc_id, lang
        )
        SELECT lang,
               COUNT(*) AS doc_cnt,
               CAST(SUM(avg_micros) AS DOUBLE) / 1e6 AS surprisal_total,
               CAST(MAX(avg_micros) AS DOUBLE) / 1e6 AS surprisal_max,
               CAST(MIN(avg_micros) AS DOUBLE) / 1e6 AS surprisal_min
        FROM per_doc GROUP BY lang
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: build the corpus unigram LM,
    then score each doc by its mean token surprisal −ln p(tok) — the
    cheap statistical stand-in for model-based quality filtering.
    Two shuffles at scale: token-keyed vocab aggregate (zipfian-skewed;
    AQE skew handling applies) and doc-keyed mean; the 1-row total is
    a broadcast. Per-token surprisals quantize straight to integer
    micro-units (see :func:`_surprisal_micros`) so both engines
    aggregate identical BIGINTs."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tx.tokens("text")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    # r14: per-token surprisal precomputed on the DISTINCT-token vocab
    # (cardinality |V|) before the join, so the log+quantize runs once
    # per type instead of once per token instance, and the broadcast
    # singleton joins the vocab frame, not the token stream. Same
    # integers reach the doc mean.
    vstats = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        _surprisal_micros(
            F.log(F.col("n").cast("double") / F.col("cnt"))
        ),
    )
    scored = toks.join(vstats, "tok").select(
        "doc_id", "lang", "surprisal_micros"
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(_avg_micros())
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"),
        (F.sum("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_total"
        ),
        (F.max("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_max"
        ),
        (F.min("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_min"
        ),
    )


def _surprisal_micros(ln_expr: Column) -> Column:
    """Quantize a per-token ln-surprisal straight to integer
    MICRO-units with the pinned IEEE idiom floor(x*1e6 + 0.5).

    Through round 8 the per-token value was ``round(ln(...), 6)`` —
    the same native-round half-boundary class that `_avg_micros`
    removed one level up (Spark rounds the exact binary double via
    BigDecimal HALF_UP, DuckDB rounds the 1e6-scaled double). The
    single floor expression is one IEEE multiply+add+floor both
    engines evaluate identically over the same input double.
    Surprisals here are non-negative by construction (the log argument
    is ≥ 1 in both LM queries), so floor(x+0.5) IS half-up. Residual
    (accepted, documented): the ``ln`` itself is computed by each
    engine's libm — an input whose ln lands within 1 ulp of an exact
    half-microunit could still diverge; unlike rational means there is
    no exact-arithmetic form for ln, and the class is measure-zero
    (none observed across the sf0.001→pseudo-sf1 sweeps)."""
    return (
        F.floor(ln_expr * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("surprisal_micros")
    )


def _avg_micros() -> Column:
    """Per-doc mean surprisal in exact integer MICRO-units.

    round-half-up of the exact rational mean p/q is the integer
    (2p + q) div (2q) — integer arithmetic both engines compute
    bit-identically. The previous ``round(double_quotient, 6)``
    diverged between engines when the quotient's binary representation
    straddles the half-microunit boundary: Spark rounds the exact
    binary value (BigDecimal HALF_UP) while DuckDB rounds the
    1e6-scaled double, and at sf0.1 two documents landed on such
    boundaries (caught by the r8 sf0.1 oracle sweep — the same
    scale-dependent class as the r4 decimal escape). Inputs are the
    already-integer ``surprisal_micros`` (see :func:`_surprisal_micros`
    — since r9 the per-token value never exists as a rounded double),
    so the whole mean is integer arithmetic; surprisals are
    non-negative, so half-up and floor-division agree across engines.
    """
    micros = F.col("surprisal_micros")
    return F.call_function(
        "div",
        F.lit(2).cast("long") * F.sum(micros) + F.count(F.lit(1)),
        F.lit(2).cast("long") * F.count(F.lit(1)),
    ).alias("avg_micros")


# --- Deterministic source-weighted sampling ----------------------------------
# Domain mixing: each source family keeps a different fraction of its
# docs, decided by a salted md5 over doc_id — reproducible across
# engines, partitionings, and retries (the property RNG sampling lacks
# at 100 TB; same rationale as sample_scan / stratified_split).

MIX_SALT = "mix1"
# source number % 4 → keep threshold on the first 4 md5 hex chars
# (fraction of 0x10000). index 0 → keep all.
MIX_THRESHOLDS = {0: None, 1: "8000", 2: "4000", 3: "1999"}


@register(
    "domain_mix_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 4
                       AS grp,
                   substr(md5('{MIX_SALT}|' || CAST(doc_id AS VARCHAR)), 1, 4)
                       AS h
            FROM documents
        ),
        kept AS (
            SELECT * FROM keyed
            WHERE grp = 0
               OR (grp = 1 AND h < '{MIX_THRESHOLDS[1]}')
               OR (grp = 2 AND h < '{MIX_THRESHOLDS[2]}')
               OR (grp = 3 AND h < '{MIX_THRESHOLDS[3]}')
        )
        SELECT grp,
               COUNT(*) AS kept_cnt,
               COUNT(DISTINCT source) AS sources,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_total
        FROM kept GROUP BY grp
    """,
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted corpus mixing with hash-deterministic keep
    decisions (keep 100%/50%/25%/10% by source group). Pure row-local
    Column expressions — no shuffle until the tiny audit aggregate, and
    the keep set is invariant under repartitioning and task retries.

    Non-matching ``source`` policy, pinned on BOTH sides: a source not
    matching ``src<digits>`` yields NULL grp (Spark cast-of-'' /
    DuckDB TRY_CAST) and every keep predicate is false on NULL, so the
    row is dropped — fixture drift surfaces as a value mismatch in the
    audit, never as an oracle crash."""
    docs = table(spark, sf_dir, "documents")
    grp = (
        F.regexp_extract("source", r"src(\d+)", 1).cast("int") % 4
    ).alias("grp")
    h = F.substring(
        tx.md5_hex(
            F.concat(F.lit(f"{MIX_SALT}|"), F.col("doc_id").cast("string"))
        ),
        1,
        4,
    )
    keyed = docs.select("doc_id", "source", grp, h.alias("h"))
    keep = F.col("grp") == 0
    for g, thr in MIX_THRESHOLDS.items():
        if thr is not None:
            keep = keep | ((F.col("grp") == g) & (F.col("h") < thr))
    return (
        keyed.filter(keep)
        .groupBy("grp")
        .agg(
            F.count("*").alias("kept_cnt"),
            F.countDistinct("source").alias("sources"),
            F.sum("doc_id").alias("kept_id_total"),
        )
    )


# --- Quantized-embedding recall ----------------------------------------------

RECALL_K = 5
QUERY_MOD = 100  # same query set as the ANN plans


@register(
    "embedding_quantize_recall",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   list_transform(embedding,
                       x -> CASE WHEN x > 0 THEN 1 ELSE -1 END) AS s
            FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, v AS qv, s AS qs FROM e
              WHERE vec_id % {QUERY_MOD} = 0),
        n AS (SELECT vec_id AS n_id, v AS nv, s AS ns FROM e),
        scored AS (
            SELECT q_id, n_id,
                   floor(list_dot_product(qv, nv)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(nv, nv)))
                         * 1e6 + 0.5) / 1e6
                       AS exact_score,
                   list_dot_product(qs, ns) AS quant_score
            FROM q CROSS JOIN n WHERE n_id <> q_id
        ),
        et AS (
            SELECT q_id, n_id FROM (
                SELECT q_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY exact_score DESC, n_id ASC
                ) AS rk FROM scored
            ) WHERE rk <= {RECALL_K}
        ),
        qt AS (
            SELECT q_id, n_id FROM (
                SELECT q_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY quant_score DESC, n_id ASC
                ) AS rk FROM scored
            ) WHERE rk <= {RECALL_K}
        )
        SELECT et.q_id,
               COUNT(qt.n_id) AS overlap_cnt,
               floor(COUNT(qt.n_id) / CAST({RECALL_K} AS DOUBLE)
                     * 1e6 + 0.5) / 1e6 AS recall
        FROM et LEFT JOIN qt ON et.q_id = qt.q_id AND et.n_id = qt.n_id
        GROUP BY et.q_id
    """,
)
def embedding_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of 1-bit sign quantization against full-precision
    cosine top-K — the measurement that justifies (or rejects) shipping
    a quantized index at 100 TB. The quantized score is an INTEGER
    (agreements − disagreements via a ±1 dot product), so its ranking
    is exactly reproducible across engines; exact scores use the
    verified floor-quantized cosine. One broadcast-query cross join
    feeds both rankings (two window sorts over the same q_id
    partitioning)."""
    from automatic_etl_spark.functions import vectors as vec
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    v = vec.to_double_array("embedding")
    s = F.transform(
        F.col("embedding"),
        lambda x: F.when(x > 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    e = emb.select(F.col("vec_id"), v.alias("v"), s.alias("s"))
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("s").alias("qs"),
    )
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("nv"),
        F.col("s").alias("ns"),
    )
    quant = F.aggregate(
        F.zip_with(F.col("qs"), F.col("ns"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # norms once per row below the cross join (r14), not per (q, n)
    # pair — bit-identical (vectors.cosine_given_norms)
    q = q.withColumn("q_nrm", vec.norm("qv"))
    n = n.withColumn("n_nrm", vec.norm("nv"))
    scored = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            qround(
                vec.cosine_given_norms("qv", "nv", "q_nrm", "n_nrm")
            ).alias("exact_score"),
            quant.alias("quant_score"),
        )
    )
    w_exact = Window.partitionBy("q_id").orderBy(
        F.desc("exact_score"), F.asc("n_id")
    )
    w_quant = Window.partitionBy("q_id").orderBy(
        F.desc("quant_score"), F.asc("n_id")
    )
    et = (
        scored.withColumn("rk", F.row_number().over(w_exact))
        .filter(F.col("rk") <= RECALL_K)
        .select("q_id", "n_id")
    )
    qt = (
        scored.withColumn("rk", F.row_number().over(w_quant))
        .filter(F.col("rk") <= RECALL_K)
        .select("q_id", "n_id", F.lit(1).alias("m"))
    )
    # Broadcast the quantized top-K side deliberately (r14, guide
    # §3.1) — with an explicit SCALE CAP, not an "any scale" claim
    # (r14 ADVICE): qt is ≤ |queries|·K rows, and the query set is the
    # modulus sample vec_id % QUERY_MOD == 0, so qt grows ~N/QUERY_MOD·K
    # with the corpus. The broadcast is valid only while that product
    # stays broadcast-sized (tens of MB; ~10⁸ rows at K=5,
    # QUERY_MOD=100 would already breach the 8 GB/512M-row broadcast
    # cap) — at that corpus scale, cap or re-modulus the query sample
    # (a recall ESTIMATE doesn't need every 100th vector) or drop the
    # hint and let the overlap join shuffle. Locally the hint is what
    # stops the executed plan FLAPPING across runs (SMJ vs BHJ, exch
    # 2↔4↔5): the tiny window outputs sit right at AQE's runtime
    # conversion threshold, and the flap kept this row unpinnable in
    # tests/test_plan_fingerprints.py.
    return (
        et.join(F.broadcast(qt), ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("m").alias("overlap_cnt"),
            qround(
                F.count("m") / F.lit(float(RECALL_K))
            ).alias("recall"),
        )
    )


# --- Dup-graph triangle census -----------------------------------------------


@register(
    "dup_graph_triangles",
    oracle=f"""
        WITH {_SQL_EDGE_CHAIN},
        tri AS (
            SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
            FROM edges e1
            JOIN edges e2 ON e2.a_id = e1.b_id
            JOIN edges e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
        )
        SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
               COUNT(*) AS n_triangles,
               CAST(COALESCE(SUM(a + b + c), 0) AS BIGINT)
                   AS triangle_id_total
        FROM tri
    """,
)
def dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph — the cluster-quality
    probe (a chain component has 0 triangles; a clique of k has
    k·(k-1)·(k-2)/6; the planted {d, d+1M, d+2M} groups are triangles
    by construction). Ordered-edge trick: every edge is stored a<b, so
    each triangle a<b<c is generated EXACTLY once by joining
    (a,b)+(b,c)+(a,c) — no ×6 duplication and no post-dedup. Two
    edge-keyed joins, O(Σ deg²) candidate work — the standard
    distributed triangle-count shape; at 100 TB the hot nodes get the
    same skew treatment as every other edge join (AQE skew split)."""
    _corpus, edges = _near_dup_edges(spark, sf_dir)
    # Materialize the verified edge list once: e1/e2/e3 and the edge
    # count otherwise re-drive the whole LSH chain 4x (A/B ~1.25x at
    # sf0.1 — ReusedExchange already absorbs part of the repetition).
    edges = edges.localCheckpoint(eager=True)
    e1 = edges.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    e2 = edges.select(F.col("a_id").alias("b"), F.col("b_id").alias("c"))
    e3 = edges.select(F.col("a_id").alias("a"), F.col("b_id").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    stats = tri.agg(
        F.count("*").alias("n_triangles"),
        F.coalesce(
            F.sum(F.col("a") + F.col("b") + F.col("c")), F.lit(0)
        ).alias("triangle_id_total"),
    )
    return n_edges.crossJoin(F.broadcast(stats))


# --- Exact-substring decontamination (r6) -------------------------------------
# The substring-containment sibling of ngram_decontaminate: a training
# doc is contaminated if it CONTAINS a benchmark doc's opening span
# verbatim (the check eval-suite hosts publish — answers leak as
# whole spans, not token-grid-aligned n-grams). Corpus reuses the
# dedup plant (every 10th doc duplicated under +1000000), so planted
# copies of benchmark docs are guaranteed hits. Scale shape: the eval
# side is tiny (eval suites are), so it broadcasts and the train side
# is ONE linear scan with a per-row contains probe — a broadcast
# nested-loop join whose inner side is a handful of spans; no shuffle
# of the corpus at all.

from automatic_etl_spark.plans.dedup_plans import _corpus, _sql_corpus

EVAL_MOD = 97
SPAN_LEN = 40
MIN_SPAN = 20


@register(
    "substring_decontaminate",
    oracle=f"""
        WITH {_sql_corpus(near_dups=False)},
        evalset AS (
            SELECT DISTINCT substr(lower(trim(text)), 1, {SPAN_LEN}) AS span
            FROM corpus
            WHERE doc_id % {EVAL_MOD} = 0 AND doc_id < {PLANT_OFFSET}
              AND length(substr(lower(trim(text)), 1, {SPAN_LEN}))
                  >= {MIN_SPAN}
        ),
        train AS (
            SELECT doc_id, lang, lower(trim(text)) AS t FROM corpus
            WHERE doc_id % {EVAL_MOD} <> 0 OR doc_id >= {PLANT_OFFSET}
        ),
        flagged AS (
            SELECT DISTINCT tr.doc_id
            FROM train tr JOIN evalset e ON contains(tr.t, e.span)
        )
        SELECT tr.lang,
               COUNT(*) AS train_docs,
               COUNT(f.doc_id) AS flagged_docs,
               CAST(COALESCE(SUM(f.doc_id), 0) AS BIGINT)
                   AS flagged_id_total
        FROM train tr LEFT JOIN flagged f ON tr.doc_id = f.doc_id
        GROUP BY tr.lang
    """,
)
def substring_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs containing any benchmark doc's opening
    SPAN_LEN-char span verbatim. Eval spans broadcast; the corpus is
    scanned once with a row-local contains probe. Returns per-lang
    (train_docs, flagged_docs, flagged_id_total)."""
    corpus = _corpus(spark, sf_dir, near_dups=False, fan_out=False)
    norm = F.lower(F.trim(F.col("text")))
    evalset = (
        corpus.filter(
            (F.col("doc_id") % EVAL_MOD == 0) & (F.col("doc_id") < PLANT_OFFSET)
        )
        .select(F.substring(norm, 1, SPAN_LEN).alias("span"))
        .filter(F.length("span") >= MIN_SPAN)
        .distinct()
    )
    train = corpus.filter(
        (F.col("doc_id") % EVAL_MOD != 0) | (F.col("doc_id") >= PLANT_OFFSET)
    ).select("doc_id", "lang", norm.alias("t"))
    flagged = (
        train.join(F.broadcast(evalset), F.contains(F.col("t"), F.col("span")))
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        train.join(flagged, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("train_docs"),
            F.count("hit").alias("flagged_docs"),
            F.coalesce(
                F.sum(F.when(F.col("hit") == 1, F.col("doc_id"))), F.lit(0)
            ).alias("flagged_id_total"),
        )
    )


# --- Zipf slope per language (r6) ---------------------------------------------
# Corpus-health diagnostic: natural language follows Zipf's law with
# exponent ~1; a corpus whose log-rank/log-frequency slope drifts far
# from -1 is boilerplate-heavy or template-generated. Least-squares
# fit of ln(freq) on ln(rank) over each language's vocabulary — the
# rank window runs over the VOCABULARY (bounded), not the corpus, and
# the moments are decimal-pinned sums of once-quantized doubles, so the
# fitted slope is engine-identical.


@register(
    "zipf_slope_by_lang",
    oracle="""
        WITH toks AS (
            SELECT lang,
                   unnest(list_filter(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> x <> '')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok
        ),
        pts AS (
            SELECT lang,
                   floor(ln(CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY c DESC, tok ASC
                   ) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS x,
                   floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS y
            FROM vocab
        ),
        m AS (
            SELECT lang, COUNT(*) AS n,
                   SUM(CAST(x AS DECIMAL(28,8))) AS sx,
                   SUM(CAST(y AS DECIMAL(28,8))) AS sy,
                   SUM(CAST(floor(x * y * 1e8 + 0.5) / 1e8
                            AS DECIMAL(28,8))) AS sxy,
                   SUM(CAST(floor(x * x * 1e8 + 0.5) / 1e8
                            AS DECIMAL(28,8))) AS sxx
            FROM pts GROUP BY lang
        )
        SELECT lang, CAST(n AS BIGINT) AS n_vocab,
               floor((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS zipf_slope
        FROM m
    """,
)
def zipf_slope_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(freq) vs ln(rank) over each lang's
    token vocabulary — the Zipf-law corpus diagnostic. Returns
    (lang, n_vocab, zipf_slope). Ranks tie-break on token text; x/y
    floor-quantize once (qround), moments accumulate as decimals."""
    return zipf_slope(table(spark, sf_dir, "documents", fan_out=False))


def zipf_slope(docs: DataFrame) -> DataFrame:
    """The computation behind ``zipf_slope_by_lang``, on any
    (lang, text) frame — separated so the property test can feed a
    synthetic corpus with a known slope and compare against a pure-
    Python least-squares reference."""
    from pyspark.sql import Window

    vocab = (
        docs.select("lang", F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    pts = vocab.select(
        "lang",
        qround(F.log(F.row_number().over(w).cast("double"))).alias("x"),
        qround(F.log(F.col("c").cast("double"))).alias("y"),
    )
    m = pts.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(28,8)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,8)")).alias("sy"),
        F.sum(qround(F.col("x") * F.col("y"), 8).cast("decimal(28,8)"))
        .alias("sxy"),
        F.sum(qround(F.col("x") * F.col("x"), 8).cast("decimal(28,8)"))
        .alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    return m.select(
        "lang",
        n.alias("n_vocab"),
        qround(
            (n * sxy - sx * sy) / (n * sxx - sx * sx)
        ).alias("zipf_slope"),
    )


# --- Quantile-stratified deterministic sampling (r6) ---------------------------
# Balanced sampling across the VALUE distribution: equi-depth decile
# cuts per event_type from the value-compressed quantile pass, every
# row assigned to its bucket (strict-exceed, FP-free), then the same
# salted-md5 keep rule as stratified_split applied WITHIN each
# (type, bucket) cell — so no value region is over/under-sampled no
# matter how skewed the distribution. The audit proves the per-cell
# rate; the keep set is invariant under repartitioning and retries.

QSTRAT_SALT = "qstrat1"
QSTRAT_KEEP_HEX = "4000"  # keep ~25% per cell (md5 prefix / 0x10000)


@register(
    "quantile_stratified_sample",
    oracle=f"""
        WITH vc AS (
            SELECT event_type, value, COUNT(*) AS c
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, value
        ),
        cum AS (
            SELECT event_type, value,
                   SUM(c) OVER (
                       PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cc,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM vc
        ),
        q AS (
            SELECT event_type,
                   {", ".join(
                       f"MIN(CASE WHEN cc >= ({i} * n + 9)"
                       f" // 10 THEN value END) AS d{i}"
                       for i in range(1, 10)
                   )}
            FROM cum GROUP BY event_type
        ),
        bucketed AS (
            SELECT e.event_type, e.event_id,
                   {" + ".join(
                       f"CASE WHEN e.value > q.d{i} THEN 1 ELSE 0 END"
                       for i in range(1, 10)
                   )} AS bucket
            FROM events e JOIN q USING (event_type)
            WHERE e.value IS NOT NULL
        ),
        kept AS (
            SELECT * FROM bucketed
            WHERE substr(md5('{QSTRAT_SALT}|'
                             || CAST(event_id AS VARCHAR)), 1, 4)
                  < '{QSTRAT_KEEP_HEX}'
        )
        SELECT event_type, bucket,
               COUNT(*) AS kept_cnt,
               CAST(SUM(event_id) AS BIGINT) AS kept_id_total
        FROM kept GROUP BY 1, 2
    """,
)
def quantile_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% deterministic sample WITHIN each (event_type, value-decile)
    cell: equi-depth cuts bound the strata, salted-md5 hashes decide
    keeps — reproducible across engines, partitionings, and retries.
    Returns the per-cell audit (event_type, bucket, kept_cnt,
    kept_id_total)."""
    from automatic_etl_spark.operators import quantiles as qt

    ev = (
        table(spark, sf_dir, "events", fan_out=False)
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    probs = {f"d{i}": (i, 10) for i in range(1, 10)}
    q = qt.grouped_type1_quantiles(ev, "event_type", "value", probs).drop(
        "n_events"
    )
    bucket = sum(
        (F.col("value") > F.col(f"d{i}")).cast("int") for i in range(1, 10)
    )
    keep = (
        F.substring(
            tx.md5_hex(
                F.concat(
                    F.lit(f"{QSTRAT_SALT}|"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            4,
        )
        < QSTRAT_KEEP_HEX
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .select("event_type", "event_id", bucket.alias("bucket"))
        .filter(keep)
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("kept_cnt"),
            F.sum("event_id").alias("kept_id_total"),
        )
    )


# --- Bigram-LM quality scoring (CCNet shape) ----------------------------------
# CCNet (Wenzek et al., 2020) filters web text by n-gram LM perplexity;
# unigram_logprob_quality above is the order-1 stand-in. This is the
# order-2 version with add-one smoothing: surprisal of each bigram is
# −ln p(w2|w1) = ln((c(w1·) + V) / (c(w1,w2) + 1)), built entirely from
# corpus counts — no external model artifact, same determinism rules.

_BIGRAM_LM_ORACLE = f"""
    WITH {_SQL_BIGRAMS},
    bg AS (SELECT doc_id, lang, unnest(g) AS bigram FROM grams),
    bcnt AS (SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY bigram),
    ctx AS (
        SELECT split_part(bigram, ' ', 1) AS w1, COUNT(*) AS c1
        FROM bg GROUP BY 1
    ),
    vocab AS (
        SELECT COUNT(DISTINCT x) AS v FROM (
            SELECT unnest(t) AS x FROM toks
        )
    ),
    scored AS (
        -- per-token micro-unit quantization, same pinned floor idiom
        -- as the unigram sibling (r9: native round(ln,6) removed)
        SELECT b.doc_id, b.lang,
               CAST(floor(ln((CAST(ctx.c1 AS DOUBLE) + vocab.v)
                             / (bcnt.c12 + 1)) * 1e6 + 0.5) AS BIGINT)
                   AS surprisal_micros
        FROM bg b
        JOIN bcnt ON b.bigram = bcnt.bigram
        JOIN ctx ON split_part(b.bigram, ' ', 1) = ctx.w1
        CROSS JOIN vocab
    ),
    per_doc AS (
        -- exact micro-unit mean, same contract as the unigram sibling
        SELECT doc_id, lang,
               (2 * SUM(surprisal_micros)
                  + COUNT(*)) // (2 * COUNT(*)) AS avg_micros
        FROM scored GROUP BY doc_id, lang
    )
    SELECT lang,
           COUNT(*) AS doc_cnt,
           CAST(SUM(avg_micros) AS DOUBLE) / 1e6 AS surprisal_total,
           CAST(MAX(avg_micros) AS DOUBLE) / 1e6 AS surprisal_max,
           CAST(MIN(avg_micros) AS DOUBLE) / 1e6 AS surprisal_min
    FROM per_doc GROUP BY lang
"""


@register("bigram_logprob_quality", oracle=_BIGRAM_LM_ORACLE)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM perplexity proxy: corpus bigram counts + context
    counts + add-one smoothing over the unigram vocabulary size give
    each bigram a surprisal −ln p(w2|w1); docs are scored by their
    mean, rolled up per language (same output shape as the unigram
    sibling so the two orders are directly comparable).

    Scale shape: the bigram stream shuffles TWICE on zipfian keys
    (bigram counts, then context counts) — both are AQE-skew-split
    candidates and both aggregate with map-side combine; the vocab
    size is a broadcast singleton. Per-bigram surprisals quantize
    straight to integer micro-units (the unigram precedent, see
    :func:`_surprisal_micros`), so both engines aggregate identical
    BIGINTs. Docs under 2 tokens have no bigrams and drop from
    scoring (fixture min is 10 tokens)."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    bg = docs.select(
        "doc_id", "lang", F.explode(tx.word_ngrams("text", 2)).alias("bigram")
    )
    bcnt = bg.groupBy("bigram").agg(F.count("*").alias("c12"))
    # r14: context counts DERIVED from the bigram counts — c(w1·) is
    # exactly Σ c12 over bigrams sharing the context word, so the
    # second full pass over the exploded bigram stream (and its
    # zipfian shuffle) collapses to a tiny aggregate over the
    # distinct-bigram frame. Same integers, one fewer full-data
    # exchange, and the stream is joined ONCE (per-bigram surprisal is
    # precomputed on the distinct-bigram frame before the join).
    ctx = bcnt.groupBy(
        F.split(F.col("bigram"), " ").getItem(0).alias("w1")
    ).agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(tx.tokens("text")).alias("x"))
        .agg(F.countDistinct("x").alias("v"))
    )
    bstats = (
        bcnt.join(
            ctx,
            F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"),
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            _surprisal_micros(
                F.log(
                    (F.col("c1").cast("double") + F.col("v"))
                    / (F.col("c12") + 1)
                )
            ),
        )
    )
    scored = bg.join(bstats, "bigram").select(
        "doc_id", "lang", "surprisal_micros"
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(_avg_micros())
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("doc_cnt"),
        (F.sum("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_total"
        ),
        (F.max("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_max"
        ),
        (F.min("avg_micros").cast("double") / F.lit(1e6)).alias(
            "surprisal_min"
        ),
    )
