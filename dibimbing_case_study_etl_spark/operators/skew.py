"""Skew-mitigation utilities for 100 TB joins.

AQE's skew-join splitting (on by default in the session factory) handles
most runtime skew; :func:`salted_join` is the explicit fallback for the
pathological case — a join key where a handful of values carry a large
fraction of all rows and even a split partition would overwhelm one task.

Mechanism: the skewed (big) side gets a deterministic salt derived from a
high-cardinality column, widening each hot key into ``n_salts`` shuffle
keys; the other side replicates each row ``n_salts`` times via a literal
explode. Row multiplicity is preserved exactly (inner join), so results
are identical to the unsalted join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the shuffle key widened by a deterministic salt.

    ``salt_source``: a (ideally unique) column on the skewed side the salt
    hashes from; defaults to all non-key columns. Supports inner and left
    joins (the skewed side must be the left/preserved side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    on = list(on)
    src = [salt_source] if salt_source else [c for c in skewed.columns if c not in on]
    if not src:
        raise ValueError("need at least one non-key column to derive the salt")
    left = skewed.withColumn(_SALT, F.pmod(F.xxhash64(*src), F.lit(n_salts)))
    right = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = left.join(right, on + [_SALT], how)
    return out.drop(_SALT)
