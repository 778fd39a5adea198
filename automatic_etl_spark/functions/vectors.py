"""Vector functions over ``array<float>`` embedding columns.

Pure ``Column`` expressions: ``zip_with`` products + ``aggregate``
left-fold. The fold starts at 0.0 and adds elements left-to-right —
bit-identical to DuckDB's ``list_dot_product`` (verified), which the
oracle plans rely on. Elements are cast to double FIRST so both
engines do double arithmetic throughout.

Scale notes: these run inside codegen on the JVM — no Python, no UDF.
A 64-dim cosine is ~190 fused multiply-adds per row; brute-force top-k
over N vectors × Q queries is O(N·Q·d) and distributes perfectly
(queries broadcast, N partitioned). For large Q·N use the LSH-bucketed
variant in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_array(c: Column | str) -> Column:
    return F.transform(_col(c), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product (matches list_dot_product exactly).

    Inputs are cast to double HERE, not by caller discipline: a raw
    ``array<float>`` column would multiply in float32 before the
    double fold, drifting from the DuckDB double oracle in the last
    rounded decimal. The cast is a no-op on already-double arrays.
    """
    products = F.zip_with(
        to_double_array(a), to_double_array(b), lambda x, y: x * y
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|·|b|) — callers should round before comparing."""
    return dot(a, b) / (norm(a) * norm(b))
