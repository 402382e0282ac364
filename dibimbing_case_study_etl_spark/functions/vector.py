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


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))
