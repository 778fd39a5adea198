"""Approximate-nearest-neighbor search over embedding columns
(SURVEY.md §7 Phase 7 — similarity search for training-data pipelines).

Two strategies:
- :func:`brute_force_topk` — exact cosine top-k. The query set is
  broadcast; the corpus never shuffles. O(N·Q·d), the correctness
  baseline and perfectly adequate when Q is small.
- :func:`lsh_bucketed_topk` — the scale path: sign-random-projection
  buckets (deterministic hyperplanes built from fixed index subsets)
  prune the corpus to same-bucket candidates before scoring. Recall
  trades against bucket count; at 100 TB the bucket column becomes the
  partition key so each query touches one partition.

Scores are rounded to 6 decimals and ranked with a pinned tiebreaker
(neighbor id) so results are stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from automatic_etl_spark.functions import vectors as vec

# Deterministic "hyperplanes": plane j sums the elements at these
# 1-based positions; the sign of the sum is one bucket bit. Fixed
# index subsets keep the construction portable to plain SQL.
DEFAULT_PLANES: tuple[tuple[int, ...], ...] = (
    (1, 9, 17, 25, 33, 41, 49, 57),
    (2, 10, 18, 26, 34, 42, 50, 58),
    (3, 11, 19, 27, 35, 43, 51, 59),
)


def projection_bucket(
    v: Column, planes: tuple[tuple[int, ...], ...] = DEFAULT_PLANES
) -> Column:
    """Concatenated sign bits of the plane projections, e.g. '101'."""
    bits = []
    for plane in planes:
        proj = F.element_at(v, plane[0])
        for idx in plane[1:]:
            proj = proj + F.element_at(v, idx)
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _scored(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    return queries.crossJoin(corpus).filter(
        F.col("q_id") != F.col("n_id")
    ).select(
        "q_id",
        "n_id",
        F.round(vec.cosine("q_vec", "n_vec"), 6).alias("score"),
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def prepare(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    role: str = "n",
) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias(f"{role}_id"),
        vec.to_double_array(vec_col).alias(f"{role}_vec"),
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k: (q_id, n_id, score, rank). Queries are broadcast —
    the corpus side never shuffles until the final per-query top-k."""
    return _topk(_scored(F.broadcast(queries), embeddings), k)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: tuple[tuple[int, ...], ...] = DEFAULT_PLANES,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    sign-projection bucket."""
    corpus_b = embeddings.withColumn("bucket", projection_bucket(F.col("n_vec"), planes))
    queries_b = queries.withColumn("bucket", projection_bucket(F.col("q_vec"), planes))
    joined = corpus_b.join(F.broadcast(queries_b), "bucket").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = joined.select(
        "q_id", "n_id", F.round(vec.cosine("q_vec", "n_vec"), 6).alias("score")
    )
    return _topk(scored, k)
