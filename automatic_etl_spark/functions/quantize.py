"""Cross-engine-deterministic quantize render.

Native ``round(x, k)`` on a computed double is engine-specific within
1 ulp of a k-dp half boundary: Spark rounds the exact binary value
HALF_UP (BigDecimal), DuckDB rounds the 10^k-scaled double. The class
produced real divergences in r8 (LM scores) and r9 (pseudo-sf1 money
sums), so rendered doubles quantize through this helper instead —
floor(x·10^k + 0.5) / 10^k, every step an IEEE operation both engines
evaluate bit-identically on the same input double. Away from half
boundaries the result equals round()'s, so converting a site does not
churn oracle hashes.

Negative inputs round half-toward-+inf (-2.5e-6 → -2e-6 at scale 6),
unlike DECIMAL HALF_UP's away-from-zero — engine-consistent, so no
oracle drift; only visible when a negative input carries more
precision than the scale.

SQL mirror (single-source scale constant so multiplier and divisor
can never drift): ``plans.relational._sql_qround`` /
``plans.relational._sql_dsum``. ``tests/test_quantize_idiom.py`` pins
that no render routes through native round on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(expr: Column | str, scale: int = 6) -> Column:
    """floor(x·10^scale + 0.5) / 10^scale — the per-row/per-group
    quantize render (see module doc)."""
    col = F.col(expr) if isinstance(expr, str) else expr
    s = F.lit(float(10**scale))
    return F.floor(col * s + F.lit(0.5)) / s
