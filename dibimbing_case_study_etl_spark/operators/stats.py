"""Distributed exact order statistics for drift testing.

The two-sample Kolmogorov–Smirnov statistic needs a GLOBAL cumulative
distribution — the textbook Spark implementation puts a window with
``orderBy`` and no ``partitionBy`` over the pooled sample, which
executes as a single task and caps the operator at one executor's
memory. This module computes the exact ECDF difference with the classic
distributed prefix-sum instead:

1. ``groupBy(value)`` — one map-side-combining shuffle collapses the
   pooled sample to per-distinct-value counts for both cohorts;
2. ``repartitionByRange(value).sortWithinPartitions(value)`` — a range
   shuffle gives globally ordered, disjoint partitions (Spark's range
   partitioner samples with deterministic per-partition seeds; the
   result is additionally pinned by an eager ``localCheckpoint`` so
   the totals pass and the scan pass read the SAME materialization);
3. per-partition totals — an O(partitions) aggregate collected to the
   driver (bounded by the partition count, not the data) becomes the
   prefix OFFSET each partition starts from;
4. one Arrow-batched ``mapInPandas`` pass adds offset + local cumsum —
   every row now carries the exact global (F_a, F_b) step heights, and
   the KS distance is a plain ``max`` aggregate.

Everything after the raw counts is integer arithmetic: the statistic is
kept as ``|cum_a * n_b - cum_b * n_a|`` (scaled by ``n_a * n_b``), so
both engines agree bit-for-bit until one final rounded division.

Reference parity: the reference has no statistical-testing surface
(pandas/Postgres ETL only); this extends the experimentation family
(x01–x10) the LLM-pipeline mandate adds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ks_two_sample_scaled(
    a: DataFrame, b: DataFrame, value_col: str, partitions: int | None = None
) -> tuple[int, int, int]:
    """Exact two-sample KS distance between ``a[value_col]`` and
    ``b[value_col]``, returned as ``(n_a, n_b, d_scaled)`` with
    ``D = d_scaled / (n_a * n_b)`` — integers end-to-end, so the
    caller controls the single lossy division. Nulls are excluded.
    Ties (within and across cohorts) follow the standard convention:
    both ECDFs step at every pooled sample point and the distance is
    evaluated post-step at each distinct value."""
    spark = a.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    pooled = (
        a.select(F.col(value_col).alias("v")).where(F.col(value_col).isNotNull())
        .withColumn("src", F.lit(1))
        .unionByName(
            b.select(F.col(value_col).alias("v"))
            .where(F.col(value_col).isNotNull())
            .withColumn("src", F.lit(2))
        )
    )
    counts = pooled.groupBy("v").agg(
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0)).cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("src") == 2, 1).otherwise(0)).cast("bigint").alias("c_b"),
    )
    ranged = (
        counts.repartitionByRange(partitions, "v")
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
        # pin ONE materialization: the totals collect and the prefix scan
        # must see identical partitioning/order (and avoid recomputing
        # the two shuffles twice)
        .localCheckpoint(eager=True)
    )
    totals = {
        r["pid"]: (r["t_a"], r["t_b"])
        for r in ranged.groupBy("pid")
        .agg(F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b"))
        .collect()  # bounded: one row per partition
    }
    n_a = sum(t[0] for t in totals.values())
    n_b = sum(t[1] for t in totals.values())
    if n_a == 0 or n_b == 0:
        raise ValueError(f"KS needs both cohorts non-empty, got {n_a}/{n_b}")
    offsets = {}
    run_a = run_b = 0
    for pid in sorted(totals):
        offsets[pid] = (run_a, run_b)
        run_a += totals[pid][0]
        run_b += totals[pid][1]

    def prefix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one invocation per partition; carry the running sums across
        # its Arrow batches (rows arrive sorted by v within the partition)
        off_a = off_b = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if off_a is None:
                off_a, off_b = offsets[int(pdf["pid"].iloc[0])]
            cum_a = off_a + pdf["c_a"].cumsum()
            cum_b = off_b + pdf["c_b"].cumsum()
            off_a, off_b = int(cum_a.iloc[-1]), int(cum_b.iloc[-1])
            yield pd.DataFrame(
                {"diff_scaled": (cum_a * n_b - cum_b * n_a).abs().astype("int64")}
            )

    d_scaled = (
        ranged.mapInPandas(prefix, schema="diff_scaled bigint")
        .agg(F.max("diff_scaled").alias("d"))
        .first()["d"]
    )
    return int(n_a), int(n_b), int(d_scaled)
