"""Range (interval) join — points matched to containing intervals
WITHOUT an equi-key, the second classic operator Spark's planner
handles poorly (a naive ``BETWEEN`` predicate plans as a broadcast
nested-loop: O(points × intervals)).

Binned construction: intervals explode onto the fixed-width bins they
cover, points map to their single bin, and the match becomes an
EQUI-join on the bin id plus a residual containment filter. A pair can
only meet in one bin from the point's side, so no dedup is needed.

Scale notes (100 TB): cost is one shuffle of points by bin and
|interval| × avg-bins-covered replicated rows — linear, partitionable,
AQE-friendly, versus the nested-loop's quadratic blow-up. Bin width
tunes the replication/selectivity trade (≈ median interval length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__bin"


def _bin_of(c: Column, width: int) -> Column:
    return F.floor(c / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end``. Numeric columns (cast timestamps to epoch
    first). ``bin_width`` is in the same unit."""
    p = points.withColumn(_BIN, _bin_of(F.col(point_col), bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), bin_width),
                # end is exclusive, but a partial last bin still overlaps
                _bin_of(F.col(end_col), bin_width),
            )
        ),
    )
    joined = p.join(i, _BIN, how).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop(_BIN)
