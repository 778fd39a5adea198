"""Vector functions over ``array<float>`` embedding columns.

Pure ``Column`` expressions: ``zip_with`` products + ``aggregate``
left-fold. The fold starts at 0.0 and adds elements left-to-right —
bit-identical to DuckDB's ``list_dot_product`` (verified), which the
oracle plans rely on. Elements are cast to double FIRST so both
engines do double arithmetic throughout.

Scale notes: JVM-side, no Python, no UDF — but higher-order lambdas
evaluate on Spark's INTERPRETED expression path per element, not
inside whole-stage codegen (the distinction that cost the minhash wide
build 3× in r10). Here the lambda is a bare multiply/add, so the
interpreted overhead is negligible at any measured scale (r10 A/B on
the 10× corpus: HOF fold 0.58 s vs a fully-unrolled element_at sum
0.66 s over 20k 64-dim vectors, identical checksums) — unlike the
md5-per-element case, where the lambda body dwarfed dispatch cost and
codegen won 3.3×. Brute-force top-k over N vectors × Q queries is
O(N·Q·d) and distributes perfectly (queries broadcast, N partitioned).
For large Q·N use the LSH-bucketed variant in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_array(c: Column | str) -> Column:
    """``array<float>`` → ``array<double>`` as a plain Cast, not a
    ``transform`` lambda (r14): Cast on an array type casts each
    element with the SAME float→double conversion the old per-element
    lambda applied (value-identical), but evaluates as one native
    array loop instead of an interpreted lambda dispatch per element —
    and on an already-double input SimplifyCasts removes it entirely,
    which makes :func:`dot`'s defensive re-cast free in every pair
    scorer (it used to copy both 64-element arrays per PAIR)."""
    return _col(c).cast("array<double>")


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


def cosine_given_norms(
    a: Column | str, b: Column | str,
    a_nrm: Column | str, b_nrm: Column | str,
) -> Column:
    """:func:`cosine` with CALLER-precomputed norms (r14 optimization).

    In a pair join, ``cosine(a, b)`` re-folds ``sqrt(dot(a,a))`` and
    ``sqrt(dot(b,b))`` for EVERY pair on the interpreted HOF path;
    pairs ≫ vectors everywhere scoring runs, so precomputing each
    side's norm once per row cuts ~2/3 of the per-pair fold work.
    Value-identical to :func:`cosine` as long as the norm columns are
    ``norm(<same array>)``: the division and the ``a_nrm * b_nrm``
    multiply keep the exact operand order, so the IEEE result is
    bit-for-bit the one ``cosine`` produces (the DuckDB oracles rely
    on that).
    """
    return dot(a, b) / (_col(a_nrm) * _col(b_nrm))
