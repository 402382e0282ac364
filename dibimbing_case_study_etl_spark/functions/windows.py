"""Window helpers.

``global_bounded()`` is the ONE sanctioned way to write an unpartitioned
(whole-table) window in this repo: it partitions by a constant, which is
semantically identical to no partition spec (every row shares the single
partition) but states the intent in the plan and keeps ``WindowExec``'s
"No Partition Defined … moving all data to a single partition" WARN out
of the bench/driver logs — a real skew regression elsewhere must not
hide behind two dozen known-bounded warnings.

Call sites must only use this over PROVABLY BOUNDED tables (calendar
days, bootstrap replicates, quantile buckets, top-k prefixes …) — the
single partition is the point, and the bound is documented where it is
used. For corpus-scale global orderings use
``operators/packing.prefix_sum`` (range-bucketed, distributed) instead.
"""

from __future__ import annotations

from pyspark.sql import WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_bounded() -> WindowSpec:
    """A whole-table window spec for bounded tables (see module doc).

    The constant key is ``spark_partition_id() * 0`` (always 0), not
    ``lit(1)``: a foldable partition expression is constant-folded away
    by the optimizer, which re-empties the partition spec and brings the
    WARN back; ``spark_partition_id`` carries the non-deterministic flag
    so it survives folding while still evaluating to the same value for
    every row."""
    return Window.partitionBy(F.spark_partition_id() * 0)
