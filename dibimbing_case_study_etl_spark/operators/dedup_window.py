"""Latest-per-key dedup — the reference's signature window operator.

Reference: ``ROW_NUMBER() OVER (PARTITION BY ts, latitude, longitude, source
ORDER BY load_ds DESC)`` then keep ``rn = 1``
(`scripts/sql/l2_tables/upsert_l2_for_ds.sql:10-21`; `README.md:258-260`).

Scale: Spark plans the rn=1 filter as WindowGroupLimit — each map task keeps
only the current best row per key before the shuffle, so the shuffle volume
is bounded by the number of distinct keys, not the number of rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_RN = "__dedup_rn"


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys`` group: the first under ``order_by``.

    ``order_by`` must be a total order within each group (include a unique
    tiebreak column) or the survivor is nondeterministic.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
