"""Cross-engine-deterministic float arithmetic.

Two failure modes make naive ``ROUND(SUM(double), k)`` unsafe for an
engine-vs-oracle value-hash comparison:

1. **Accumulation order.** A distributed sum adds doubles in a different
   order than a single-node oracle; the results differ at ~1e-9, and when
   the true value sits within that distance of a rounding boundary the
   rounded outputs differ (observed: TPC-H Q9-style profit sum flipping
   between 1964425.43 and 1964425.44 at sf0.01).

2. **Round algorithm.** Spark's ``round`` goes through Java
   ``BigDecimal.valueOf(double)`` — the *shortest decimal string* that
   round-trips — then HALF_UP, while DuckDB rounds the binary double
   directly. For ``36197.50499999999...`` (shortest repr "36197.505"),
   Spark rounds to 36197.51 and DuckDB to 36197.50.

Both disappear if every rounding happens at the *integer* position after
scaling (a double whose shortest repr is "N.5" is exactly N.5, so both
algorithms agree at integer position), and every sum runs over exact
BIGINT integers:

    SUM(CAST(ROUND(x * 10^k) AS BIGINT)) / 10^k

The helpers below implement that on the Spark side; each has a matching
SQL-text generator for the DuckDB oracle so both sides compute the same
thing by construction. The scaled-integer sum is also *more* correct at
100 TB: it is order-independent, so the result doesn't depend on
partitioning or AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iround(col: Column, scale: int) -> Column:
    """Round a double to ``scale`` decimals, cross-engine-deterministically
    (integer rounding after scaling)."""
    f = 10**scale
    return F.round(col * f).cast("bigint") / float(f)


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column: per-row round to ``scale``
    decimals → exact BIGINT sum → scale back. Null rows are skipped (SUM
    semantics)."""
    f = 10**scale
    return F.sum(F.round(col * f).cast("bigint")) / float(f)


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact integer sum divided by non-null count.
    The division operands are bitwise identical on both engines, so the
    resulting double is too."""
    f = 10**scale
    return F.sum(F.round(col * f).cast("bigint")) / float(f) / F.count(col)


# --- SQL-text twins for the DuckDB oracle ---------------------------------


def sql_iround(expr: str, scale: int) -> str:
    f = 10**scale
    return f"(CAST(ROUND(({expr}) * {f}) AS BIGINT) / {f}.0)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    f = 10**scale
    return f"(SUM(CAST(ROUND(({expr}) * {f}) AS BIGINT)) / {f}.0)"


def sql_davg(expr: str, scale: int = 2) -> str:
    f = 10**scale
    return f"(SUM(CAST(ROUND(({expr}) * {f}) AS BIGINT)) / {f}.0 / COUNT({expr}))"
