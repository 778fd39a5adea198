"""Oracle-checked plans for similarity search over ``embeddings``.

The DuckDB mirror uses ``list_dot_product`` (verified bit-identical to
Spark's aggregate left-fold on double arrays) and the same rounded
scores + pinned tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automatic_etl_spark.operators import similarity as sim
from automatic_etl_spark.plans.registry import register
from automatic_etl_spark.plans.relational import qround
from automatic_etl_spark.sources.parquet import table

K = 5
QUERY_MOD = 100  # vec_id % 100 == 0 → the query set

def _sql_cos(a: str, b: str) -> str:
    """The ONE DuckDB cosine text — every similarity oracle derives
    from this so a rounding/precision change cannot desynchronize a
    subset of them."""
    return (
        f"floor(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b}))) * 1e6 + 0.5) / 1e6"
    )


_SQL_COSINE = _sql_cos("qv", "nv")


def _sql_bucket(var: str) -> str:
    bits = []
    for plane in sim.DEFAULT_PLANES:
        proj = " + ".join(f"{var}[{i}]" for i in plane)
        bits.append(f"CASE WHEN ({proj}) > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
        n AS (SELECT vec_id AS n_id, v AS nv FROM e),
        scored AS (
            SELECT q_id, n_id, {_SQL_COSINE} AS score
            FROM q CROSS JOIN n WHERE n_id <> q_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY score DESC, n_id ASC
            ) AS rank
            FROM scored
        )
        SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    queries = sim.prepare(
        emb.filter(F.col("vec_id") % QUERY_MOD == 0), role="q"
    )
    return sim.brute_force_topk(corpus, queries, k=K)


@register(
    "ann_lsh_topk",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (
            SELECT vec_id AS q_id, v AS qv, {_sql_bucket('v')} AS bucket
            FROM e WHERE vec_id % {QUERY_MOD} = 0
        ),
        n AS (SELECT vec_id AS n_id, v AS nv, {_sql_bucket('v')} AS bucket FROM e),
        scored AS (
            SELECT q_id, n_id, {_SQL_COSINE} AS score
            FROM q JOIN n USING (bucket) WHERE n_id <> q_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY score DESC, n_id ASC
            ) AS rank
            FROM scored
        )
        SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    queries = sim.prepare(
        emb.filter(F.col("vec_id") % QUERY_MOD == 0), role="q"
    )
    return sim.lsh_bucketed_topk(corpus, queries, k=K)


DEDUP_THRESHOLD = 0.35
CENTROID_MOD = 67  # vec_id % 67 == 3 → the fixed IVF coarse centroids
NPROBE = 2


def _sql_cosine_rank_assign(
    out: str, cent: str, cid: str = "c_id", cvec: str = "cv"
) -> str:
    """One k-means assignment round as a CTE: every vector to its
    argmax-cosine centroid (ties → smallest centroid id). The ONE
    source of the assignment rule — `_SQL_ASSIGN` and the ann_ivf_topk
    oracle are generated from it, so a tiebreak/rounding tweak cannot
    leave one copy on old semantics."""
    return f"""
        {out} AS (
            SELECT n_id, {cid} AS list_id, nv FROM (
                SELECT n.vec_id AS n_id, n.v AS nv, c.{cid},
                       ROW_NUMBER() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY list_dot_product(n.v, c.{cvec})
                                    / (sqrt(list_dot_product(n.v, n.v))
                                       * sqrt(list_dot_product(c.{cvec},
                                                               c.{cvec}))) DESC,
                                    c.{cid} ASC
                       ) AS rn
                FROM e n CROSS JOIN {cent} c
            ) WHERE rn = 1
        )
"""


# (e, c) corpus/centroid CTE prefix + the rn=1 assignment, shared by
# every IVF oracle in this module.
_SQL_ASSIGN = (
    f"""
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        c AS (
            SELECT vec_id AS c_id, v AS cv FROM e
            WHERE vec_id % {CENTROID_MOD} = 3
        ),"""
    + _sql_cosine_rank_assign("assign", "c")
)


@register(
    "embedding_cosine_dedup",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {_sql_bucket('CAST(embedding AS DOUBLE[])')} AS bucket
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   floor(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v)))
                         * 1e6 + 0.5) / 1e6 AS score
            FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT a_id, b_id, score FROM pairs WHERE score >= {DEDUP_THRESHOLD}
    """,
)
def embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, sign-projection blocked."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.cosine_near_dup_pairs(
        sim.prepare(emb, role="n"), threshold=DEDUP_THRESHOLD
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
        WITH {_SQL_ASSIGN},
        probe AS (
            SELECT q_id, c_id AS list_id, qv FROM (
                SELECT q.vec_id AS q_id, q.v AS qv, c.c_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_dot_product(q.v, c.cv)
                                    / (sqrt(list_dot_product(q.v, q.v))
                                       * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                                    c.c_id ASC
                       ) AS rn
                FROM e q CROSS JOIN c WHERE q.vec_id % {QUERY_MOD} = 0
            ) WHERE rn <= {NPROBE}
        ),
        scored AS (
            SELECT p.q_id, a.n_id,
                   floor(list_dot_product(p.qv, a.nv)
                         / (sqrt(list_dot_product(p.qv, p.qv))
                            * sqrt(list_dot_product(a.nv, a.nv)))
                         * 1e6 + 0.5) / 1e6 AS score
            FROM probe p JOIN assign a USING (list_id)
            WHERE a.n_id <> p.q_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY score DESC, n_id ASC
            ) AS rank
            FROM scored
        )
        SELECT q_id, n_id, score, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: fixed coarse centroids (vec_id % 67 == 3), nprobe=2."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    queries = sim.prepare(
        emb.filter(F.col("vec_id") % QUERY_MOD == 0), role="q"
    )
    centroids = sim.prepare(
        emb.filter(F.col("vec_id") % CENTROID_MOD == 3), role="c"
    )
    return sim.ivf_topk(corpus, queries, centroids, k=K, nprobe=NPROBE)


@register(
    "embedding_norm_stats",
    oracle="""
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT label, COUNT(*) AS cnt,
               (CAST(SUM(CAST(floor(sqrt(list_dot_product(v, v))
                                    * 1e6 + 0.5) AS BIGINT))
                     AS DOUBLE) / 1e6) AS norm_total
        FROM e GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from automatic_etl_spark.functions import vectors as vec

    emb = table(spark, sf_dir, "embeddings")
    v = vec.to_double_array("embedding")
    return (
        emb.select("label", vec.norm(v).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(F.floor((F.col("nrm")) * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
            .cast("double")
            .alias("norm_total"),
        )
    )


@register(
    "ivf_mean_centroids",
    oracle=f"""
        WITH {_SQL_ASSIGN},
        ex AS (
            SELECT list_id,
                   unnest(nv) AS val,
                   unnest(range(1, len(nv) + 1)) AS ord
            FROM assign
        ),
        dims AS (
            SELECT list_id, ord,
                   SUM(CAST(val AS DECIMAL(28,12))) AS s,
                   COUNT(*) AS c
            FROM ex GROUP BY 1, 2
        ),
        sq AS (
            SELECT list_id,
                   CAST(floor(CAST(s AS DOUBLE) / c * 1e6 + 0.5) / 1e6
                        AS DECIMAL(18,6)) AS m,
                   c
            FROM dims
        )
        SELECT list_id,
               MAX(c) AS n_members,
               floor(sqrt(CAST(SUM(m * m) AS DOUBLE)) * 1e6 + 0.5) / 1e6
                   AS centroid_norm
        FROM sq GROUP BY list_id
    """,
)
def ivf_mean_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF training step: assign to seed centroids, then compute each
    list's MEAN centroid distributed (the k-means update — at scale
    this loop is: assign → mean → reassign, all shuffle-bounded by
    (list, dim) keys)."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    centroids = sim.prepare(
        emb.filter(F.col("vec_id") % CENTROID_MOD == 3), role="c"
    )
    inverted = sim.ivf_assign(corpus, centroids)
    return sim.mean_centroid_stats(inverted)


_SQL_MEANS = """
        ex{i} AS (
            SELECT list_id,
                   unnest(nv) AS val,
                   unnest(range(1, len(nv) + 1)) AS ord
            FROM a{i}
        ),
        d{i} AS (
            SELECT list_id, ord,
                   SUM(CAST(val AS DECIMAL(28,12))) AS s,
                   COUNT(*) AS c
            FROM ex{i} GROUP BY 1, 2
        )
"""


@register(
    "kmeans_two_iter",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS c_id, v AS cv FROM e
            WHERE vec_id % {CENTROID_MOD} = 3
        ),
        {_sql_cosine_rank_assign("a1", "c0")},
        {_SQL_MEANS.format(i=1)},
        c1 AS (
            SELECT list_id AS c_id,
                   list(CAST(floor(CAST(s AS DOUBLE) / c * 1e6 + 0.5) / 1e6
                             AS DOUBLE)
                        ORDER BY ord) AS cv
            FROM d1 GROUP BY list_id
        ),
        {_sql_cosine_rank_assign("a2", "c1")},
        {_SQL_MEANS.format(i=2)},
        sq AS (
            SELECT list_id,
                   CAST(floor(CAST(s AS DOUBLE) / c * 1e6 + 0.5) / 1e6
                        AS DECIMAL(18,6)) AS m,
                   c
            FROM d2
        )
        SELECT list_id,
               MAX(c) AS n_members,
               floor(sqrt(CAST(SUM(m * m) AS DOUBLE)) * 1e6 + 0.5) / 1e6
                   AS centroid_norm
        FROM sq GROUP BY list_id
    """,
)
def kmeans_two_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO full k-means iterations — the iterative-algorithm pattern:
    a driver-side loop over distributed assign/update steps (seed →
    assign → mean update → re-assign → final update stats). The oracle
    replays both iterations as chained CTEs, cross-validating the loop
    end-to-end. Scale notes: each iteration is one broadcast of the
    (tiny) centroid set plus one (list, dim)-keyed shuffle; in a long
    production loop you'd ``localCheckpoint()`` each centroid set to
    truncate lineage — with 2 iterations the lazy chain is fine."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    cent = sim.prepare(emb.filter(F.col("vec_id") % CENTROID_MOD == 3), role="c")
    inverted = sim.ivf_assign(corpus, cent)  # iteration 1: assign
    cent = sim.mean_centroids(inverted)  # iteration 1: update
    inverted = sim.ivf_assign(corpus, cent)  # iteration 2: assign
    return sim.mean_centroid_stats(inverted)  # iteration 2: update stats


# --- Higher-order array function surface (r6) ---------------------------------
# The HOF family over array columns in one oracle-checked pass:
# transform (double cast), filter (sign census), reverse + zip_with/
# aggregate (reversed self-dot), slice (head sub-vector), array_max.
# These are the building blocks every embedding/tensor column
# manipulation reduces to, and they all run inside whole-stage codegen
# (no UDF, no Python). Per-row work only — zero shuffles until the
# tiny label aggregate.

HEAD_DIMS = 8


@register(
    "higher_order_array_ops",
    oracle=f"""
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        per AS (
            SELECT label,
                   len(list_filter(v, x -> x > 0)) AS pos_cnt,
                   floor(CAST(list_max(v) AS DOUBLE) * 1e6 + 0.5) / 1e6
                       AS max_c,
                   floor(list_dot_product(v, list_reverse(v))
                         * 1e6 + 0.5) / 1e6 AS revdot,
                   floor(list_dot_product(v[1:{HEAD_DIMS}],
                                          v[1:{HEAD_DIMS}])
                         * 1e6 + 0.5) / 1e6 AS head_norm2
            FROM e
        )
        SELECT label, COUNT(*) AS cnt,
               CAST(SUM(pos_cnt) AS BIGINT) AS pos_total,
               MAX(max_c) AS max_component,
               (CAST(SUM(CAST(floor((revdot) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS revdot_total,
               (CAST(SUM(CAST(floor((head_norm2) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
                   AS head_norm2_total
        FROM per GROUP BY label
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOF census over ``embeddings`` per label: positive-
    component counts (filter), max component (array_max), reversed
    self-dot (reverse + zip_with + aggregate fold), head sub-vector
    norm² (slice + fold). All vectorized Column expressions; the
    reversed dot reuses the left-fold ``vec.dot`` verified
    bit-identical to DuckDB's list_dot_product."""
    from automatic_etl_spark.functions import vectors as vec

    emb = table(spark, sf_dir, "embeddings", fan_out=False)
    v = vec.to_double_array("embedding")
    per = emb.select(
        "label",
        F.size(F.filter(v, lambda x: x > 0)).alias("pos_cnt"),
        qround(F.array_max(v)).alias("max_c"),
        qround(vec.dot(v, F.reverse(v))).alias("revdot"),
        qround(
            vec.dot(F.slice(v, 1, HEAD_DIMS), F.slice(v, 1, HEAD_DIMS))
        ).alias("head_norm2"),
    )
    return per.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.sum("pos_cnt").alias("pos_total"),
        F.max("max_c").alias("max_component"),
        (F.sum(F.floor((F.col("revdot")) * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("revdot_total"),
        (F.sum(F.floor((F.col("head_norm2")) * F.lit(1e6) + F.lit(0.5)).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("head_norm2_total"),
    )


# --- ANN recall report (r6) ---------------------------------------------------
# The measurement that justifies shipping IVF as the scale path:
# recall@K of the nprobe=2 IVF search against brute-force ground
# truth. At 100 TB you can't run the brute baseline on everything —
# but you CAN run it on the (tiny) query set, which is exactly this
# query's shape: truth = brute-force over queries only (broadcast
# queries, corpus partition-scanned once), approx = the IVF plan,
# then an equi-join on (q_id, n_id) counts hits. Both rankings pin
# ties by (score DESC, n_id ASC) on rounded scores, so the top-K sets
# are engine-identical and recall is an exact integer ratio.


@register(
    "ann_recall_report",
    oracle=f"""
        WITH {_SQL_ASSIGN},
        q AS (SELECT vec_id AS q_id, v AS qv FROM e
              WHERE vec_id % {QUERY_MOD} = 0),
        truth AS (
            SELECT q_id, n_id FROM (
                SELECT q_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY score DESC, n_id ASC
                ) AS rank FROM (
                    SELECT q.q_id, n.n_id,
                           floor(list_dot_product(q.qv, n.nv)
                                 / (sqrt(list_dot_product(q.qv, q.qv))
                                    * sqrt(list_dot_product(n.nv, n.nv)))
                                 * 1e6 + 0.5) / 1e6
                               AS score
                    FROM q CROSS JOIN
                         (SELECT n_id, nv FROM assign) n
                    WHERE n.n_id <> q.q_id
                )
            ) WHERE rank <= {K}
        ),
        probe AS (
            SELECT q_id, c_id AS list_id, qv FROM (
                SELECT q.q_id, q.qv, c.c_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY list_dot_product(q.qv, c.cv)
                                    / (sqrt(list_dot_product(q.qv, q.qv))
                                       * sqrt(list_dot_product(c.cv, c.cv)))
                                    DESC,
                                    c.c_id ASC
                       ) AS rn
                FROM q CROSS JOIN c
            ) WHERE rn <= {NPROBE}
        ),
        approx AS (
            SELECT q_id, n_id FROM (
                SELECT s.q_id, s.n_id, ROW_NUMBER() OVER (
                    PARTITION BY s.q_id ORDER BY s.score DESC, s.n_id ASC
                ) AS rank FROM (
                    SELECT p.q_id, a.n_id,
                           floor(list_dot_product(p.qv, a.nv)
                                 / (sqrt(list_dot_product(p.qv, p.qv))
                                    * sqrt(list_dot_product(a.nv, a.nv)))
                                 * 1e6 + 0.5) / 1e6
                               AS score
                    FROM probe p JOIN assign a USING (list_id)
                    WHERE a.n_id <> p.q_id
                ) s
            ) WHERE rank <= {K}
        ),
        hits AS (
            SELECT t.q_id, COUNT(a.n_id) AS h
            FROM truth t LEFT JOIN approx a
              ON t.q_id = a.q_id AND t.n_id = a.n_id
            GROUP BY t.q_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(h) AS BIGINT) AS hits_total,
               CAST(MIN(h) AS BIGINT) AS min_hits,
               CAST(MAX(h) AS BIGINT) AS max_hits,
               floor(SUM(h) / CAST(COUNT(*) * {K} AS DOUBLE)
                     * 1e6 + 0.5) / 1e6 AS recall_at_k
        FROM hits
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@{K} of IVF (nprobe={NPROBE}, fixed seed centroids)
    against brute-force ground truth over the query set: one row
    (n_queries, hits_total, min_hits, max_hits, recall_at_k). Hit
    counting is a (q_id, n_id) equi-join of two deterministically
    tie-broken top-K sets — exact integers; recall is their ratio."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = sim.prepare(emb, role="n")
    queries = sim.prepare(
        emb.filter(F.col("vec_id") % QUERY_MOD == 0), role="q"
    )
    centroids = sim.prepare(
        emb.filter(F.col("vec_id") % CENTROID_MOD == 3), role="c"
    )
    truth = sim.brute_force_topk(corpus, queries, k=K).select("q_id", "n_id")
    approx = sim.ivf_topk(corpus, queries, centroids, k=K, nprobe=NPROBE)
    approx = approx.select("q_id", F.col("n_id").alias("a_n_id"))
    hits = (
        truth.join(
            approx,
            (truth.q_id == approx.q_id) & (truth.n_id == approx.a_n_id),
            "left",
        )
        .groupBy(truth.q_id)
        .agg(F.count("a_n_id").alias("h"))
    )
    return hits.agg(
        F.count("*").alias("n_queries"),
        F.sum("h").alias("hits_total"),
        F.min("h").alias("min_hits"),
        F.max("h").alias("max_hits"),
        qround(
            F.sum("h") / (F.count("*") * F.lit(K)).cast("double")
        ).alias("recall_at_k"),
    )


# --- Maximal Marginal Relevance (MMR) diversified retrieval -------------------
# Retrieval stacks (RAG, eval-set mining) diversify top-k results so
# near-duplicate neighbors don't crowd the answer set: greedily pick
# argmax λ·rel(x) − (1−λ)·max_{s∈S} sim(x, s) (Carbonell & Goldstein,
# 1998). The greedy step is inherently sequential in k, but each step
# is a full parallel scan — the right 100 TB shape is k distributed
# passes with the (tiny) selected set broadcast, never a driver-side
# candidate loop.

MMR_K = 3
MMR_LAMBDA = 0.7
MMR_CAND_MOD = 7  # vec_id % 7 == 1 → candidate pool


_MMR_ORACLE = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 1),
    cand AS (
        SELECT vec_id, v, {_sql_cos('qv', 'v')} AS rel
        FROM e CROSS JOIN q
        WHERE vec_id % {MMR_CAND_MOD} = 1 AND vec_id <> qid
    ),
    s1 AS (
        SELECT vec_id, v, rel FROM cand
        ORDER BY rel DESC, vec_id ASC LIMIT 1
    ),
    r2 AS (
        SELECT c.vec_id, c.v, c.rel,
               floor(({MMR_LAMBDA} * c.rel
                      - {round(1 - MMR_LAMBDA, 6)}
                        * {_sql_cos('c.v', 's1.v')})
                     * 1e6 + 0.5) / 1e6 AS score
        FROM cand c CROSS JOIN s1 WHERE c.vec_id <> s1.vec_id
    ),
    s2 AS (
        SELECT vec_id, v, rel, score FROM r2
        ORDER BY score DESC, vec_id ASC LIMIT 1
    ),
    r3 AS (
        SELECT c.vec_id, c.v, c.rel,
               floor(({MMR_LAMBDA} * c.rel
                      - {round(1 - MMR_LAMBDA, 6)}
                        * greatest({_sql_cos('c.v', 's1.v')},
                                   {_sql_cos('c.v', 's2.v')}))
                     * 1e6 + 0.5) / 1e6 AS score
        FROM cand c CROSS JOIN s1 CROSS JOIN s2
        WHERE c.vec_id NOT IN (s1.vec_id, s2.vec_id)
    ),
    s3 AS (
        SELECT vec_id, rel, score FROM r3
        ORDER BY score DESC, vec_id ASC LIMIT 1
    )
    SELECT 1 AS sel_rank, vec_id, rel, rel AS score FROM s1
    UNION ALL
    SELECT 2, vec_id, rel, score FROM s2
    UNION ALL
    SELECT 3, vec_id, rel, score FROM s3
"""


@register("mmr_diversified_topk", oracle=_MMR_ORACLE)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR top-k (k=3, λ=0.7): query = the min-vec_id embedding,
    candidates = vec_id % 7 == 1; round r scores every remaining
    candidate λ·rel − (1−λ)·max cosine to the already-selected set and
    takes the rounded-score argmax (vec_id tiebreak).

    Scale shape: the candidate frame with precomputed rel is
    materialized ONCE (localCheckpoint); each of the k rounds is one
    full parallel pass — candidates × broadcast selected set (≤ k−1
    rows) → per-candidate max-sim → TakeOrdered(1). Driver traffic is
    exactly one (id, vector, scores) row per round; nothing iterates
    per-candidate on the driver. Cosine parity with the DuckDB oracle
    reuses the module's verified left-fold == list_dot_product
    identity, scores rounded at one site before the argmax so both
    engines rank identical values."""
    from automatic_etl_spark.functions import vectors as vec

    emb = table(spark, sf_dir, "embeddings", fan_out=False)
    prepared = emb.select(
        "vec_id", vec.to_double_array("embedding").alias("v")
    )
    empty = spark.createDataFrame(
        [], "sel_rank int, vec_id long, rel double, score double"
    )
    q_rows = prepared.orderBy("vec_id").limit(1).collect()
    if not q_rows:  # empty embeddings: degrade like the oracle (0 rows)
        return empty
    q_row = q_rows[0]
    qid, qv = q_row["vec_id"], q_row["v"]
    q_lit = F.array(*[F.lit(float(x)) for x in qv])
    cand = (
        prepared.where(
            (F.col("vec_id") % MMR_CAND_MOD == 1) & (F.col("vec_id") != qid)
        )
        .select(
            "vec_id", "v", qround(vec.cosine(q_lit, F.col("v"))).alias("rel")
        )
        .localCheckpoint(eager=True)
    )
    lam = F.lit(MMR_LAMBDA)
    one_minus = F.lit(round(1 - MMR_LAMBDA, 6))
    selected: list[tuple[int, list[float], float, float]] = []
    for _ in range(MMR_K):
        if not selected:
            scored = cand.select("vec_id", "v", "rel", F.col("rel").alias("score"))
        else:
            sel_df = spark.createDataFrame(
                [(i, v) for i, v, _r, _s in selected],
                "sel_id long, sel_v array<double>",
            )
            pool = cand.where(
                ~F.col("vec_id").isin([i for i, *_ in selected])
            )
            scored = (
                pool.join(F.broadcast(sel_df))
                .groupBy("vec_id", "v", "rel")
                .agg(
                    F.max(
                        qround(vec.cosine(F.col("v"), F.col("sel_v")))
                    ).alias("maxsim")
                )
                .select(
                    "vec_id", "v", "rel",
                    qround(
                        lam * F.col("rel") - one_minus * F.col("maxsim")
                    ).alias("score"),
                )
            )
        tops = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(1).collect()
        if not tops:  # pool exhausted before k picks — emit fewer rows,
            break  # matching the oracle's empty later-round CTEs
        top = tops[0]
        selected.append(
            (top["vec_id"], top["v"], top["rel"], top["score"])
        )
    return spark.createDataFrame(
        [
            (r + 1, i, rel, score)
            for r, (i, _v, rel, score) in enumerate(selected)
        ],
        "sel_rank int, vec_id long, rel double, score double",
    )
