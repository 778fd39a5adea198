"""Oracle-checked plans for the near-dup dedup suite.

Each plan builds a corpus with PLANTED duplicates (every 10th doc
re-appended, near-dups with a 3-token suffix) so dup detection is
non-trivial, then runs the real operators. The DuckDB oracle mirrors
tokenization → shingling → hashing step-for-step; SQL is generated
from the same constants so the engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automatic_etl_spark.functions import text as tx
from automatic_etl_spark.operators import text_dedup as td
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.sources.parquet import table

NEAR_DUP_SUFFIX = " zyx wvu tsr"
NUM_HASHES = 8
BANDS = 4
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.5

# --- shared corpus construction ---------------------------------------------

# Planted ids live ABOVE a clamped base id space: every planted corpus
# filters the base table to doc_id < PLANT_OFFSET, so the +PLANT_OFFSET
# (and +2*PLANT_OFFSET) shifts can never collide with a real doc_id at
# ANY table size (at fixture scale the clamp is a no-op). Without it a
# documents table past 1M rows would silently merge a real doc's
# shingles with a planted copy's — engine-consistently on both sides,
# so the oracles could never catch the corruption.
PLANT_OFFSET = 1_000_000


def _corpus(
    spark: SparkSession, sf_dir: str, near_dups: bool, fan_out: bool = True
) -> DataFrame:
    """Every 5th doc, plus planted copies of every 10th doc (exact or
    3-token-suffix near-dups) under doc_id+PLANT_OFFSET.

    ``fan_out=False`` for consumers whose downstream is codegen
    projections + aggregate only (no interpreted-HOF shingling)."""
    docs = (
        table(spark, sf_dir, "documents", fan_out=fan_out)
        .select("doc_id", "text", "lang")
        .filter(F.col("doc_id") < PLANT_OFFSET)
    )
    base = docs.filter(F.col("doc_id") % 5 == 0)
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        (
            F.concat(F.col("text"), F.lit(NEAR_DUP_SUFFIX))
            if near_dups
            else F.col("text")
        ).alias("text"),
        "lang",
    )
    return base.unionByName(planted)


def _sql_corpus(near_dups: bool) -> str:
    text_expr = f"text || '{NEAR_DUP_SUFFIX}'" if near_dups else "text"
    return f"""
        corpus AS (
            SELECT doc_id, text, lang FROM documents
            WHERE doc_id % 5 = 0 AND doc_id < {PLANT_OFFSET}
            UNION ALL
            SELECT doc_id + {PLANT_OFFSET} AS doc_id, {text_expr} AS text, lang
            FROM documents WHERE doc_id % 10 = 0 AND doc_id < {PLANT_OFFSET}
        )
    """


# The ONE DuckDB mirror of functions/text.tokens() — every oracle in
# this module that tokenizes derives from this constant so a tokenizer
# change cannot desynchronize a subset of the oracles.
_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
    " x -> x <> '')"
)


_SQL_SHINGLES = f"""
        toks AS (
            SELECT doc_id, {_SQL_TOKENS} AS t
            FROM corpus
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(t) - 2),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                   )) AS shingle
            FROM toks
        )
"""

_SQL_JACCARD = """
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        jac AS (
            SELECT i.a_id, i.b_id,
                   i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.a_id
            JOIN sizes sb ON sb.doc_id = i.b_id
        )
"""

_SIG_COLS = ", ".join(
    f"min(substr(md5('{k}|' || shingle), 1, 8)) AS h{k}"
    for k in range(NUM_HASHES)
)
_SQL_SIGNATURES = f"""
        sig AS (
            SELECT doc_id, {_SIG_COLS}
            FROM sh GROUP BY doc_id
        )
"""

_BAND_MATCH = " OR ".join(
    " AND ".join(
        f"a.h{b * ROWS_PER_BAND + r} = b.h{b * ROWS_PER_BAND + r}"
        for r in range(ROWS_PER_BAND)
    )
    for b in range(BANDS)
)


# --- exact dedup (hash groupBy, W1-style keep-first) -------------------------


@register(
    "exact_dedup",
    oracle=f"""
        WITH {_sql_corpus(near_dups=False)},
        hashed AS (SELECT doc_id, lang, md5(text) AS h FROM corpus),
        kept AS (
            SELECT doc_id, lang FROM hashed
            QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id ASC) = 1
        )
        SELECT lang, COUNT(*) AS kept_cnt, CAST(SUM(doc_id) AS BIGINT) AS keeper_id_total
        FROM kept GROUP BY lang
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir, near_dups=False)
    w = Window.partitionBy(tx.md5_hex("text")).orderBy(F.asc("doc_id"))
    kept = (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("kept_cnt"), F.sum("doc_id").alias("keeper_id_total")
    )


# --- n-gram Jaccard (exact quadratic baseline) -------------------------------


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
        WITH {_sql_corpus(near_dups=True)},
        {_SQL_SHINGLES},
        {_SQL_JACCARD}
        SELECT COUNT(*) AS pair_cnt,
               CAST(SUM(a_id) AS BIGINT) AS a_id_total,
               CAST(SUM(b_id) AS BIGINT) AS b_id_total,
               (CAST(SUM(CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS jaccard_total
        FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir, near_dups=True)
    # jaccard_pairs consumes the shingle frame three times (sizes +
    # both self-join sides) — materialize once (r14; interleaved A/B
    # at sf0.1: median 2.75→2.41 s).
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    pairs = td.jaccard_pairs(sh).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    return pairs.agg(
        F.count("*").alias("pair_cnt"),
        F.sum("a_id").alias("a_id_total"),
        F.sum("b_id").alias("b_id_total"),
        (F.sum(F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("jaccard_total"),
    )


# --- MinHash + LSH (the scale path) ------------------------------------------


@register(
    "minhash_lsh_dedup",
    oracle=f"""
        WITH {_sql_corpus(near_dups=True)},
        {_SQL_SHINGLES},
        {_SQL_SIGNATURES},
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM sig a JOIN sig b
              ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
        ),
        {_SQL_JACCARD},
        verified AS (
            SELECT jac.* FROM jac
            JOIN cand ON jac.a_id = cand.a_id AND jac.b_id = cand.b_id
            WHERE jac.jaccard >= {JACCARD_THRESHOLD}
        )
        SELECT (SELECT COUNT(*) FROM cand) AS candidate_cnt,
               COUNT(*) AS verified_cnt,
               CAST(SUM(a_id) AS BIGINT) AS a_id_total,
               (CAST(SUM(CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS jaccard_total
        FROM verified
    """,
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir, near_dups=True)
    # The shingle table feeds the signature build, both sides of the
    # verification join, and the size aggregate — four evaluations of
    # the scan→tokenize→interpreted-HOF-shingle→explode subtree per
    # action. localCheckpoint materializes it ONCE (r14, guide §1.2 /
    # §5; interleaved A/B at sf0.1: median 3.80→2.90 s). The r8 A/B
    # that rejected persist() measured InMemoryRelation (AQE-blocking,
    # memory-store writes); checkpoint block reads carry neither
    # penalty. At 100 TB the LSH pipeline would instead WRITE the
    # shingle/signature tables once and verify from disk.
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    # signatures row-form (r10): value-identical to the wide build but
    # whole-stage-codegen'd — the wide form's higher-order transform
    # hashes on Spark's interpreted path (3.3x slower at honest 10x
    # data; the r8 A/B that picked it ran on the constant-corpus bug).
    # The groupBy exchange carries ~1 row/doc, not doc×shingle: explode
    # keeps a doc's shingles in one partition, so map-side partial mins
    # finish each doc before the shuffle.
    signatures = td.minhash_signatures(sh, NUM_HASHES)
    # candidates deliberately NOT checkpointed (r14 A/B, cand_ckpt):
    # the count and verify branches re-derive the distinct pair set,
    # but AQE stage reuse already serves the expensive signature/band
    # shuffles from cache (4 ReusedExchange in the executed plan), so
    # materializing the tiny pair set measured +2% median at sf0.1 —
    # the extra barrier job outweighs the saved post-shuffle agg.
    candidates = td.lsh_candidate_pairs(signatures, BANDS, ROWS_PER_BAND)
    verified = td.jaccard_pairs(sh, candidates=candidates).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    cand_cnt = candidates.agg(F.count("*").alias("candidate_cnt"))
    stats = verified.agg(
        F.count("*").alias("verified_cnt"),
        F.sum("a_id").alias("a_id_total"),
        (F.sum(F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("jaccard_total"),
    )
    return cand_cnt.crossJoin(stats)


# --- MinHash + LSH from a MATERIALIZED signature table -----------------------


def _matview_sig_dir(sf_dir: str) -> str:
    """Signature-table location for minhash_lsh_matview: a per-USER
    fixed dir keyed by the fixture basename. Fixed (not mkdtemp) so
    repeated runs overwrite instead of leaking one tree per run;
    user-keyed so another account cannot pre-create or poison it;
    same-user concurrency is pinned single-writer (see caller)."""
    import getpass
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_minhash_sig_{getpass.getuser()}",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )


@register(
    "minhash_lsh_matview",
    oracle=f"""
        WITH {_sql_corpus(near_dups=True)},
        {_SQL_SHINGLES},
        {_SQL_SIGNATURES},
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM sig a JOIN sig b
              ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
        ),
        {_SQL_JACCARD},
        verified AS (
            SELECT jac.* FROM jac
            JOIN cand ON jac.a_id = cand.a_id AND jac.b_id = cand.b_id
            WHERE jac.jaccard >= {JACCARD_THRESHOLD}
        )
        SELECT (SELECT COUNT(*) FROM sig) AS sig_cnt,
               (SELECT COUNT(*) FROM cand) AS candidate_cnt,
               COUNT(*) AS verified_cnt,
               CAST(SUM(a_id) AS BIGINT) AS a_id_total,
               (CAST(SUM(CAST(floor(jaccard * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS jaccard_total
        FROM verified
    """,
)
def minhash_lsh_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-consumer LSH shape done the at-scale way: WRITE the
    signature table once, then every consumer scans the materialized
    frame instead of re-paying the md5×K signature build.

    Exercises the multi-consumer guidance in operators/text_dedup.py
    as tested code (VERDICT r8 #8): a signature build is recomputed at
    every plan occurrence, so multi-consumer shapes must materialize
    (or accept re-derivation). The writer is the ROW-form build (r10:
    codegen'd explode + map-side-min groupBy — 2.4-3.3x faster than
    the wide form's interpreted higher-order transform, and its
    exchange carries ~1 row/doc since explode keeps each doc's
    shingles in one partition).
    Here the materialized table feeds TWO consumers — the band-key
    candidate join and the signature census (``sig_cnt`` output
    column) — each scanning K+1 narrow parquet columns, never the
    documents table. At 100 TB the signature table is ~1% the corpus
    size, so re-derivation cost dominates any realistic storage cost
    the moment a second consumer exists.

    Values are identical to ``minhash_lsh_dedup`` by construction
    (materialization changes where bytes live, not what they are);
    the oracle reuses the same fragments with the added census column.
    The write path follows the fixed-dir precedent (catalog_plans:
    a fresh mkdtemp per call would leak one signature tree per run)
    but keys the root by USER (ADVICE r9: a world-predictable /tmp
    path can be squatted by another account and poisons read-back) —
    within one user the path stays fixed, preserving the no-leak
    property via overwrite semantics. Concurrent sessions of the SAME
    user on the same sf_dir still race the overwrite: single-writer
    is the harness reality and the pinned assumption here
    (tests/test_matview_sig_dir.py).
    """
    corpus = _corpus(spark, sf_dir, near_dups=True, fan_out=False)
    sig_dir = _matview_sig_dir(sf_dir)
    # One shingle build for BOTH the signature writer and the Jaccard
    # verify (r14): previously each derived its own shingle frame, and
    # jaccard_pairs consumes its copy three more times — five
    # evaluations of the tokenize→HOF-shingle→explode subtree per run.
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    td.minhash_signatures(sh, NUM_HASHES).write.mode(
        "overwrite"
    ).parquet(sig_dir)
    sig = spark.read.parquet(sig_dir)

    # Candidates stay LAZY — measured and REJECTED twice (r14
    # cand_ckpt: eager checkpoint +2%; r15 cand_mat, VERDICT r14 #6:
    # writing the candidate table beside the signature table and
    # scanning it from both consumers measured ~neutral at sf0.1 and
    # 10-28% SLOWER at the 10× stress corpus —
    # bench_baselines/ab_cand_mat_r15.jsonl — because AQE stage reuse
    # already serves the band self-join's shuffle to both the census
    # count and the verify join, so the extra write job + read-back
    # is pure cost at both measured scales).
    candidates = td.lsh_candidate_pairs(sig, BANDS, ROWS_PER_BAND)
    verified = td.jaccard_pairs(sh, candidates=candidates).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )

    sig_cnt = sig.agg(F.count("*").alias("sig_cnt"))
    cand_cnt = candidates.agg(F.count("*").alias("candidate_cnt"))
    stats = verified.agg(
        F.count("*").alias("verified_cnt"),
        F.sum("a_id").alias("a_id_total"),
        (F.sum(F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("jaccard_total"),
    )
    return sig_cnt.crossJoin(cand_cnt).crossJoin(stats)


# --- MinHash + LSH with bucket-size cap (the 100 TB skew guard) --------------

BUCKET_CAP = 10
BOILERPLATE = (
    "standard legal disclaimer all rights reserved contents may not be "
    "reproduced without permission of the publisher"
)

_SQL_BAND_KEYS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    + " || ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + " AS key FROM sig"
    for b in range(BANDS)
)


@register(
    "minhash_lsh_capped",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % 5 = 0 AND doc_id < {PLANT_OFFSET}
            UNION ALL
            SELECT doc_id + {PLANT_OFFSET}, '{BOILERPLATE}'
            FROM documents WHERE doc_id % 10 = 0 AND doc_id < {PLANT_OFFSET}
            UNION ALL
            SELECT doc_id + {2 * PLANT_OFFSET}, text
            FROM documents WHERE doc_id % 20 = 0 AND doc_id < {PLANT_OFFSET}
        ),
        {_SQL_SHINGLES},
        {_SQL_SIGNATURES},
        bk AS ({_SQL_BAND_KEYS}),
        bsizes AS (SELECT band, key, COUNT(*) AS n FROM bk GROUP BY 1, 2),
        kept AS (SELECT band, key FROM bsizes WHERE n <= {BUCKET_CAP}),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bk a
            JOIN kept k ON a.band = k.band AND a.key = k.key
            JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
        ),
        {_SQL_JACCARD},
        verified AS (
            SELECT jac.* FROM jac
            JOIN cand ON jac.a_id = cand.a_id AND jac.b_id = cand.b_id
            WHERE jac.jaccard >= {JACCARD_THRESHOLD}
        )
        SELECT (SELECT COUNT(*) FROM bsizes WHERE n > {BUCKET_CAP})
                   AS dropped_buckets,
               (SELECT COUNT(*) FROM cand) AS candidate_cnt,
               COUNT(*) AS verified_cnt,
               CAST(SUM(a_id) AS BIGINT) AS a_id_total
        FROM verified
    """,
)
def minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup with the bucket-size cap engaged against
    PLANTED boilerplate skew: every 10th doc is replaced by one shared
    legal-disclaimer text, so its band buckets blow past BUCKET_CAP and
    are dropped before the pair join; exact-copy pairs planted under
    +2000000 sit in tiny buckets and must survive. The dropped-bucket
    count is an output column — capping is observable, never silent."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < PLANT_OFFSET)
    )
    corpus = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                F.lit(BOILERPLATE).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + 2 * PLANT_OFFSET).alias("doc_id"), "text"
            )
        )
    )
    # Materialized once (r14): signatures + both jaccard probe sides +
    # sizes re-derive this subtree otherwise (see minhash_lsh_dedup;
    # interleaved A/B at sf0.1: median 4.93→3.84 s).
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    # row-form signatures (r10): codegen'd hashing, ~1-row/doc exchange
    # (see minhash_lsh_dedup) — the wide form's interpreted transform
    # was 2.4-3.3x slower once the stress corpus genuinely scaled
    signatures = td.minhash_signatures(sh, NUM_HASHES)
    keys = td.lsh_band_keys(signatures, BANDS, ROWS_PER_BAND)
    # ONE census frame feeds both the dropped-bucket report and the
    # cap filter: identical subtrees let ReusedExchange compute the
    # corpus→shingle→signature→census chain once per action, where two
    # independently-built aggregates re-ran the whole chain.
    sizes = td.bucket_sizes(keys, ["band", "key"])
    dropped = (
        sizes.filter(F.col("bucket_n") > BUCKET_CAP)
        .agg(F.count("*").alias("dropped_buckets"))
    )
    candidates = td.lsh_candidate_pairs(
        signatures, BANDS, ROWS_PER_BAND,
        max_bucket_size=BUCKET_CAP, keys=keys, sizes=sizes,
    )
    verified = td.jaccard_pairs(sh, candidates=candidates).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    cand_cnt = candidates.agg(F.count("*").alias("candidate_cnt"))
    stats = verified.agg(
        F.count("*").alias("verified_cnt"),
        F.sum("a_id").alias("a_id_total"),
    )
    return dropped.crossJoin(cand_cnt).crossJoin(stats)


# --- SimHash ------------------------------------------------------------------


def _sql_parity(digit: str) -> str:
    return (
        f"CASE WHEN {digit} BETWEEN '0' AND '9' "
        f"THEN (ascii({digit}) - 48) % 2 "
        f"ELSE (ascii({digit}) - 87) % 2 END"
    )


_VOTE_COLS = ", ".join(
    f"SUM(CASE WHEN {_sql_parity(f'substr(md5(tok), {d}, 1)')} = 1 "
    f"THEN 1 ELSE -1 END) AS v{d}"
    for d in range(1, 17)
)
_BIT_CONCAT = " || ".join(
    f"CASE WHEN v{d} > 0 THEN '1' ELSE '0' END" for d in range(1, 17)
)


@register(
    "simhash_buckets",
    oracle=f"""
        WITH {_sql_corpus(near_dups=True)},
        tokd AS (
            SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS tok
            FROM corpus
        ),
        votes AS (SELECT doc_id, {_VOTE_COLS} FROM tokd GROUP BY doc_id),
        sig AS (SELECT doc_id, {_BIT_CONCAT} AS simhash FROM votes),
        buckets AS (
            SELECT simhash, COUNT(*) AS sz FROM sig GROUP BY simhash
        )
        SELECT COUNT(*) AS distinct_sigs,
               CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_buckets,
               CAST(SUM(sz - 1) AS BIGINT) AS removable_rows,
               MAX(sz) AS max_bucket
        FROM buckets
    """,
)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir, near_dups=True, fan_out=False)
    sig = td.simhash16(corpus)
    buckets = sig.groupBy("simhash").agg(F.count("*").alias("sz"))
    return buckets.agg(
        F.count("*").alias("distinct_sigs"),
        F.sum((F.col("sz") > 1).cast("int")).alias("dup_buckets"),
        F.sum(F.col("sz") - 1).alias("removable_rows"),
        F.max("sz").alias("max_bucket"),
    )


# --- W4: ReplacingMergeTree FINAL-on-read parity -----------------------------


@register(
    "dedup_final_view",
    oracle="""
        WITH latest AS (
            SELECT user_id, event_type, value, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC NULLS LAST, event_id ASC
            ) AS rn
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_total
        FROM latest WHERE rn = 1 GROUP BY event_type
    """,
)
def dedup_final_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: register the dedup as a VIEW (`dedup_view`) and aggregate
    THROUGH `spark.table(...)` — every reader sees merged state with no
    rewrite, the ReplacingMergeTree ``FINAL``-on-read contract."""
    from automatic_etl_spark.operators.dedup import dedup_view
    from automatic_etl_spark.sources.parquet import table as t

    events = t(spark, sf_dir, "events")
    # Fixed name: createOrReplaceTempView replaces it, so repeated
    # invocations (bench best-of-2, oracle sweeps) hold exactly ONE
    # catalog entry — a fresh uuid per call leaked views unboundedly
    # across a long session. The view must outlive this function (the
    # returned frame reads it lazily), so it is never dropped here.
    name = "events_final_dedup"
    dedup_view(
        events, ["user_id"], [F.col("ts")], name, tiebreaker=("event_id",)
    )
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 100)).alias("cents_total"),
        )
    )


# --- MinHash estimator calibration (r6) ---------------------------------------
# The QA step a production near-dup pipeline runs before trusting its
# signatures: for every LSH candidate pair, compare the MinHash
# ESTIMATE of Jaccard (fraction of agreeing signature components —
# the unbiased estimator the whole scheme rests on) against the EXACT
# shingle Jaccard, and histogram the absolute error. Estimate and
# exact are both derived from integer counts over identical md5
# min-hashes, so the error buckets are engine-exact. Scale shape:
# everything is keyed by the (bounded) candidate set — the estimate
# is a signature self-join on candidates, the exact term reuses the
# candidate-driven intersection probe (linear in candidates, immune
# to hot-shingle skew).

ERR_BUCKETS = 10


@register(
    "minhash_jaccard_calibration",
    oracle=f"""
        WITH {_sql_corpus(near_dups=True)},
        {_SQL_SHINGLES},
        {_SQL_SIGNATURES},
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM sig a JOIN sig b
              ON a.doc_id < b.doc_id AND ({_BAND_MATCH})
        ),
        est AS (
            SELECT c.a_id, c.b_id,
                   ({" + ".join(
                       f"CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END"
                       for k in range(NUM_HASHES)
                   )}) / CAST({NUM_HASHES} AS DOUBLE) AS est_j
            FROM cand c
            JOIN sig a ON a.doc_id = c.a_id
            JOIN sig b ON b.doc_id = c.b_id
        ),
        {_SQL_JACCARD},
        joined AS (
            SELECT e.a_id, e.b_id, e.est_j,
                   COALESCE(j.jaccard, 0.0) AS exact_j
            FROM est e LEFT JOIN jac j
              ON e.a_id = j.a_id AND e.b_id = j.b_id
        )
        SELECT LEAST(CAST(floor(abs(est_j - exact_j) * {ERR_BUCKETS})
                          AS INT), {ERR_BUCKETS - 1}) AS err_bucket,
               COUNT(*) AS cnt,
               (CAST(SUM(CAST(floor(est_j * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS est_total,
               (CAST(SUM(CAST(floor(exact_j * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS exact_total
        FROM joined GROUP BY 1
    """,
)
def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute-error histogram of the MinHash Jaccard estimator vs
    exact shingle Jaccard over the LSH candidate pairs:
    (err_bucket, cnt, est_total, exact_total), bucket = floor(|est −
    exact|·10) capped at 9. est and exact both reduce to integer
    counts over the same hashes, so buckets are engine-exact."""
    corpus = _corpus(spark, sf_dir, near_dups=True, fan_out=False)
    # Materialized once (r14): the signature build and jaccard_pairs'
    # three consumers re-derive the shingle subtree otherwise
    # (interleaved A/B at sf0.1: median 3.01→2.79 s).
    sh = td.shingle_rows(corpus).localCheckpoint(eager=True)
    # ROW-form signatures here, deliberately: this query consumes the
    # signature frame THREE times (candidate build + both est-join
    # sides), and the groupBy's shuffle is a ReusedExchange that
    # amortizes the md5×K hashing across all three. The map-side wide
    # form re-pays the hashing per consumer (bench A/B at sf0.1:
    # row 1.2-1.7 s vs wide 4.2 s / wide+checkpoint 3.0 s), so the
    # shuffle it saves costs more than it buys in this shape.
    signatures = td.minhash_signatures(sh, NUM_HASHES)
    candidates = td.lsh_candidate_pairs(signatures, BANDS, ROWS_PER_BAND)

    agree = sum(
        (F.col(f"a.h{k}") == F.col(f"b.h{k}")).cast("int")
        for k in range(NUM_HASHES)
    )
    est = (
        candidates.join(
            signatures.alias("a"), F.col("a.doc_id") == F.col("a_id")
        )
        .join(signatures.alias("b"), F.col("b.doc_id") == F.col("b_id"))
        .select(
            "a_id", "b_id",
            (agree / F.lit(float(NUM_HASHES))).alias("est_j"),
        )
    )
    exact = td.jaccard_pairs(sh, candidates=candidates).select(
        "a_id", "b_id", F.col("jaccard").alias("exact_j")
    )
    joined = est.join(exact, ["a_id", "b_id"], "left").select(
        "a_id", "b_id", "est_j",
        F.coalesce("exact_j", F.lit(0.0)).alias("exact_j"),
    )
    bucket = F.least(
        F.floor(F.abs(F.col("est_j") - F.col("exact_j")) * ERR_BUCKETS)
        .cast("int"),
        F.lit(ERR_BUCKETS - 1),
    )
    return joined.groupBy(bucket.alias("err_bucket")).agg(
        F.count("*").alias("cnt"),
        (F.sum(F.floor(F.col("est_j") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("est_total"),
        (F.sum(F.floor(F.col("exact_j") * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("exact_total"),
    )


# --- Sparse all-pairs cosine (inverted index + df pruning) --------------------
# The third near-dup algorithm family beside MinHash-LSH (lexical,
# probabilistic) and embedding-cosine (dense, model-dependent):
# EXACT sparse tf-idf cosine over an inverted index with document-
# frequency pruning (the "Scaling Up All Pairs Similarity Search"
# shape, Bayardo et al. 2007). Terms appearing in fewer than
# SPARSE_DF_MIN docs can't create pairs worth scoring; terms above
# SPARSE_DF_CAP are dropped BEFORE the pair join so each surviving
# term contributes at most df² bounded pair candidates — the same
# bounded-bucket discipline as operators/text_dedup.cap_buckets, but
# principled by idf (a ubiquitous term carries ~zero cosine weight
# anyway).

SPARSE_DF_MIN = 2
SPARSE_DF_CAP = 30
SPARSE_THRESHOLD = 0.5

_SPARSE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    w AS (
        SELECT t.doc_id, t.tok,
               floor(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df)
                     * 1e6 + 0.5) / 1e6 AS w
        FROM tf t JOIN df d ON t.tok = d.tok CROSS JOIN n
        WHERE d.df BETWEEN {SPARSE_DF_MIN} AND {SPARSE_DF_CAP}
    ),
    norm AS (
        SELECT doc_id,
               sqrt(CAST(SUM(CAST(floor(w * w * 1e8 + 0.5) / 1e8
                                  AS DECIMAL(28,8)))
                         AS DOUBLE)) AS nrm
        FROM w GROUP BY doc_id
    ),
    u AS (
        SELECT w.doc_id, w.tok,
               floor(w.w / norm.nrm * 1e6 + 0.5) / 1e6 AS u
        FROM w JOIN norm ON w.doc_id = norm.doc_id
        WHERE norm.nrm > 0
    ),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               floor(CAST(SUM(CAST(floor(a.u * b.u * 1e8 + 0.5) / 1e8
                                   AS DECIMAL(28,8)))
                          AS DOUBLE) * 1e6 + 0.5) / 1e6 AS score
        FROM u a JOIN u b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id, score FROM pairs WHERE score >= {SPARSE_THRESHOLD}
"""


@register("sparse_cosine_pairs", oracle=_SPARSE_ORACLE)
def sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tf-idf cosine near-dup pairs via the inverted index:
    per-doc term weights tf·ln(N/df) restricted to the selective df
    band [2, 30], L2-normalized, then a term-keyed self-join sums
    u_a·u_b per ordered pair and keeps score ≥ 0.5.

    Scale shape: two token-keyed aggregates build tf/df (zipfian,
    AQE-skew-splittable), the df band bounds every term's pair
    contribution at df² ≤ 900 BEFORE the self-join (no all-pairs term
    exists — a ubiquitous term never reaches the join), and the pair
    aggregate is map-side combinable on (a_id, b_id). Every float
    crossing the engines is floor-quantized (qround) at ONE site then
    sums as DECIMAL (weights 6dp, squared/paired products 8dp), so
    neither the order-dependent double-sum trap nor the native-round
    cross-engine half-boundary trap can fire. Complements `minhash_lsh_dedup`
    (probabilistic lexical) and `embedding_cosine_dedup` (dense
    semantic): this one is exact AND lexical."""
    docs = table(spark, sf_dir, "documents", fan_out=False)
    toks = docs.select("doc_id", F.explode(tx.tokens("text")).alias("tok"))
    # tf feeds THREE consumers (df, N, weights) and u feeds both sides
    # of the pair join — materialize each once instead of re-running
    # the token explode + aggregate per consumer (the measured-reuse
    # pattern from enrichment_plans; halves the exchange count).
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = (
        tf.join(
            df.where(F.col("df").between(SPARSE_DF_MIN, SPARSE_DF_CAP)),
            "tok",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            qround(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    norm = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(
                qround(F.col("w") * F.col("w"), 8).cast("decimal(28,8)")
            ).cast("double")
        ).alias("nrm")
    )
    u = (
        w.join(norm, "doc_id")
        .where(F.col("nrm") > 0)
        .select(
            "doc_id",
            "tok",
            qround(F.col("w") / F.col("nrm")).alias("u"),
        )
        .localCheckpoint(eager=True)
    )
    a = u.select(
        F.col("doc_id").alias("a_id"), "tok", F.col("u").alias("ua")
    )
    b = u.select(
        F.col("doc_id").alias("b_id"), "tok", F.col("u").alias("ub")
    )
    pairs = (
        a.join(b, "tok")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            qround(
                F.sum(
                    qround(F.col("ua") * F.col("ub"), 8).cast(
                        "decimal(28,8)"
                    )
                ).cast("double")
            ).alias("score")
        )
    )
    return pairs.where(F.col("score") >= SPARSE_THRESHOLD)
