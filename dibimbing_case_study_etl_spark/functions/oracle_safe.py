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
scaling, with an IEEE round-to-nearest-even (``rint`` on Spark,
``round_even`` on DuckDB), and every sum runs over exact BIGINT integers:

    SUM(CAST(rint(x * 10^k) AS BIGINT)) / 10^k

``rint``/``round_even`` are single exact FP operations on the *binary*
double — no BigDecimal string round-trip on either side — so both engines
see bit-identical inputs (one FP multiply of the same double) and apply
the same IEEE rounding rule; the outputs are identical by construction
(stress-verified on exact-.5 and nextafter(.5) boundary values). The
switch from ``ROUND`` (half-up) also removed the hot-path cost: Spark's
``round`` on doubles allocates a ``BigDecimal.valueOf`` per row, ~2.3×
slower than the ``Math.rint`` intrinsic in whole-stage codegen.

The scaled-integer sum is also *more* correct at 100 TB: it is
order-independent, so the result doesn't depend on partitioning or AQE
decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rint(col: Column) -> Column:
    return F.call_function("rint", col)


def iround(col: Column, scale: int) -> Column:
    """Round a double to ``scale`` decimals, cross-engine-deterministically
    (half-even integer rounding after scaling)."""
    f = 10**scale
    return _rint(col * f).cast("bigint") / float(f)


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double column: per-row round to ``scale``
    decimals → exact BIGINT sum → scale back. Null rows are skipped (SUM
    semantics)."""
    f = 10**scale
    return F.sum(_rint(col * f).cast("bigint")) / float(f)


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact integer sum divided by non-null count.
    The division operands are bitwise identical on both engines, so the
    resulting double is too."""
    f = 10**scale
    return F.sum(_rint(col * f).cast("bigint")) / float(f) / F.count(col)


# --- SQL-text twins for the DuckDB oracle ---------------------------------


def sql_iround(expr: str, scale: int) -> str:
    f = 10**scale
    return f"(CAST(round_even(({expr}) * {f}, 0) AS BIGINT) / {f}.0)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    f = 10**scale
    return f"(SUM(CAST(round_even(({expr}) * {f}, 0) AS BIGINT)) / {f}.0)"


def sql_davg(expr: str, scale: int = 2) -> str:
    f = 10**scale
    return f"(SUM(CAST(round_even(({expr}) * {f}, 0) AS BIGINT)) / {f}.0 / COUNT({expr}))"
