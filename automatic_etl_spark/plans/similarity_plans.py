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
from automatic_etl_spark.sources.parquet import table

K = 5
QUERY_MOD = 100  # vec_id % 100 == 0 → the query set

_SQL_COSINE = (
    "round(list_dot_product(qv, nv)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))), 6)"
)


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


@register(
    "embedding_norm_stats",
    oracle="""
        WITH e AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT label, COUNT(*) AS cnt,
               CAST(SUM(CAST(round(sqrt(list_dot_product(v, v)), 6)
                             AS DECIMAL(18,6))) AS DOUBLE) AS norm_total
        FROM e GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from automatic_etl_spark.functions import vectors as vec

    emb = table(spark, sf_dir, "embeddings")
    v = vec.to_double_array("embedding")
    return (
        emb.select("label", F.round(vec.norm(v), 6).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("nrm").cast("decimal(18,6)"))
            .cast("double")
            .alias("norm_total"),
        )
    )
