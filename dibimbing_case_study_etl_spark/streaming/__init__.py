"""Structured Streaming surface: incremental weather ingestion
(file source + AvailableNow + foreachBatch upsert) and event-stream
analytics (watermarked windowed aggregation, session windows)."""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# Deployment override for the scale-adaptive state-partition derivation
# below (set per topology on a real cluster; unset = derive from input
# size, which is correct at every measured SF).
_STATE_PARTITIONS_ENV = "SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"

# Target micro-batch input bytes per state-store shard. Each shuffle
# partition of a stateful streaming operator is a state-store INSTANCE
# with fixed per-batch cost (store load, delta commit, snapshot
# maintenance) — r11 measurement on the st/q52 harnesses: per-trigger
# wall is dominated by that fixed cost (SCALE.md r11 streaming curve:
# null legs 6.5/11.4 s at 32 stores; probe: q52 2.5–3.1 s at 32 stores
# vs 1.8–2.3 s at 4–8), so shard count must track DATA, not the core
# count: a constant `cores` under-shards big batches (hot stores) and
# over-shards small ones (all fixed cost). 256 KiB/shard, not larger:
# Python-per-key stateful operators (applyInPandasWithState) parallelize
# their per-key constant cost across shards, and the r11 family probe
# found the joint optimum there (st04 13.1 s at 2 shards -> 6.4 s at 8;
# the store-bound topologies moved < 1 s either way).
_STATE_TARGET_BYTES = 256 << 10


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (file sizes for scans; no
    job runs). `spark.sql.defaultSizeInBytes` (Long.MaxValue) means
    "unknown", not "huge" — treat any implausibly large estimate as
    no-estimate (same convention as ``operators.dedup._spread_partitions``)."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        unknown = int(
            df.sparkSession.conf.get("spark.sql.defaultSizeInBytes", str(1 << 62))
        )
        if est <= 0 or est >= min(unknown, 1 << 50):
            return None
        return est
    except Exception:
        return None


def stream_state_partitions(source: DataFrame) -> int:
    """Scale-adaptive shuffle/state partition count for a streaming query
    fed (per micro-batch) by roughly the data in ``source``: one state
    shard per ~256 KiB of input, clamped to [2, 4 × defaultParallelism].
    Data-proportional, never a constant tuned to either local mode or a
    cluster — small batches collapse to a few shards (fixed per-store
    cost dominates), large ones fan out past the core count until the
    clamp; deployments with known key cardinality can pin the value via
    ``SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS``."""
    env = os.environ.get(_STATE_PARTITIONS_ENV)
    if env:
        n = int(env)
        if n < 1:
            raise ValueError(f"{_STATE_PARTITIONS_ENV}={n} must be >= 1")
        return n
    sc = source.sparkSession.sparkContext
    cap = 4 * sc.defaultParallelism
    est = _plan_size_bytes(source)
    if est is None:
        return sc.defaultParallelism
    return max(2, min((est + _STATE_TARGET_BYTES - 1) // _STATE_TARGET_BYTES, cap))


@contextmanager
def scaled_state_partitions(spark: SparkSession, source: DataFrame) -> Iterator[int]:
    """Pin ``spark.sql.shuffle.partitions`` to the adaptive state-shard
    count for the duration of a streaming run (the value is baked into
    the query's state layout at start), restoring the session value —
    batch work outside the stream keeps its own partitioning."""
    n = stream_state_partitions(source)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
