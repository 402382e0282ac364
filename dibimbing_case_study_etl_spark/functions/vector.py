"""Embedding-vector primitives over ``array<float>`` columns.

Everything is ``zip_with``/``aggregate`` over arrays — JVM-side, inside
whole-stage codegen, no Python. Accumulation is sequential in element
order and in DOUBLE, which makes the result bitwise-identical to the
DuckDB oracle's ``list_cosine_similarity`` on the same data (verified),
so similarity queries can hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def clamp_unit(col: Column) -> Column:
    """Clamp a similarity into the mathematical bound [-1, 1] — identity
    except for float-error overshoot on (near-)identical vectors.

    CONTRACT — zero-norm inputs: under the engine's sessions (Spark 4
    ANSI default), a zero embedding FAILS FAST — ``dot/(0·n)`` raises
    DIVIDE_BY_ZERO before the clamp ever sees a value, so degenerate
    vectors can never silently rank as duplicates. (With ANSI disabled
    the division would yield NaN instead, and because both Spark and
    DuckDB order NaN above every double the clamp would turn it into a
    perfect 1.0 — the silent-footgun variant.) Either way the contract
    is the same: filter zero vectors upstream (s04's dim stats and s05's
    normalize audit both surface them). Pinned in
    `test_llm_ops.py::test_cosine_zero_vector_contract`."""
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), col))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, clamped into the mathematical bound [-1, 1].

    The clamp is the identity everywhere except float-error overshoot:
    identical vectors can evaluate to 1.0000000000000002 under
    dot/(sqrt·sqrt) while DuckDB's ``list_cosine_similarity`` returns
    exactly 1.0 — without the clamp, exact-duplicate pairs (common in
    replicated/augmented corpora) hash-diverge from the oracle even
    though every generic pair is bitwise-identical (sf1 sweep finding).

    Zero-norm inputs score 1.0 (see :func:`clamp_unit`'s contract) —
    filter degenerate embeddings upstream."""
    a, b = as_double(a), as_double(b)
    return clamp_unit(dot(a, b) / (norm(a) * norm(b)))
