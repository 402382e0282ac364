"""Keyed upsert (MERGE) over plain partitioned Parquet — the engine's one
genuinely custom plan shape (SURVEY §2.6).

Reproduces the reference's Postgres ``INSERT ... ON CONFLICT (pk) DO UPDATE``
(`scripts/load_parquet_to_postgres_l1.py:52-61`) as a composed DataFrame
program:

1. **In-batch duplicate arbitration** — Postgres applies batch rows
   sequentially so the *last* duplicate wins (`load:140-147`); a
   set-oriented merge must pre-dedup with an explicit ordering
   (``latest_per_key`` on ``order_by``).
2. **Split-update semantics** — on key match only ``update_cols`` take the
   source value; every other column keeps the target value (L1 deliberately
   does NOT update date/hour, `load:56-60`; L2 updates all non-key cols,
   `upsert_l2_for_ds.sql:28-33`).
3. **Partition-scoped atomicity** — only partitions present in the source
   are read back and rewritten (`partitionOverwriteMode=dynamic``); untouched
   partitions are never opened. Requires the partition column to be
   functionally dependent on the merge keys (here: date = date(ts), ts ∈ PK),
   so a matched row can never migrate between partitions.

Scale: the merge cost is O(touched partitions), not O(table). The join is an
equi-join on the PK — at 100 TB both sides arrive hash-partitioned by key,
and the source side (one ingest day) is typically broadcastable. Re-running
any batch converges (idempotency, `README.md:38, 261`).

**Concurrency contract (SINGLE WRITER).** Plain Parquet has no
transaction log: dynamic partition overwrite is atomic per partition
directory (staged then swapped) but carries no cross-writer coordination —
two concurrent merges into the same table interleave as last-writer-wins
per partition, and one writer's read snapshot can miss the other's
in-flight rows (lost update). The reference sidesteps this with a
Postgres transaction (`load_parquet_to_postgres_l1.py:143-148`). This
engine makes the contract EXPLICIT and enforced: ``merge_upsert`` takes a
filesystem advisory lock (atomic ``O_CREAT|O_EXCL`` marker next to the
table) for the duration of the merge and raises
:class:`ConcurrentWriterError` — never silently corrupts — when another
writer holds it. Crash-orphaned locks older than ``lock_stale_sec`` are
reclaimed. The lock is a local/NFS/HDFS-semantics guard: object stores
without atomic create-if-absent (plain S3) need an external coordinator
or a transactional table format — if Delta/Iceberg is on the classpath
its native MERGE INTO replaces this whole module; the composed plan keeps
the engine dependency-free.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.operators.dedup_window import latest_per_key


class ConcurrentWriterError(RuntimeError):
    """Another merge holds the table's writer lock — the caller must retry
    or serialize its pipelines; proceeding would interleave partition
    overwrites from two read snapshots (lost updates)."""


@contextmanager
def writer_lock(target_path: str, stale_sec: float = 3600.0):
    """Advisory exclusive writer lock for a local-FS Parquet table:
    atomically creates ``<table>.__writer_lock`` (``O_CREAT|O_EXCL`` —
    the one FS primitive that is atomic on POSIX and HDFS) holding
    pid+timestamp for diagnosis. Raises :class:`ConcurrentWriterError` if
    the lock exists and is younger than ``stale_sec``; older locks are
    treated as crash orphans and reclaimed."""
    lock = target_path.rstrip("/") + ".__writer_lock"
    os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            age = time.time() - os.path.getmtime(lock)
            holder = open(lock).read()
        except OSError:  # holder released between our check and read
            age, holder = 0.0, "?"
        if age <= stale_sec:
            raise ConcurrentWriterError(
                f"writer lock {lock!r} is held ({holder}); concurrent merges "
                "into one plain-Parquet table are last-writer-wins per "
                "partition and can lose updates — serialize the pipelines, "
                "or adopt a transactional table format for multi-writer"
            ) from None
        os.unlink(lock)  # crash orphan
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path or path.startswith("file:"):
        return os.path.exists(path.removeprefix("file:"))
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str],
    order_by: Sequence[Column | str],
    partition_col: str = "date",
    lock: bool = True,
) -> int:
    """MERGE ``source`` into the Parquet table at ``target_path``.

    ``order_by`` resolves duplicate keys *within* the source batch (first row
    under this ordering wins — pass e.g. ``[F.desc("load_ds"), F.desc("_row")]``
    for last-wins batch semantics). Returns -1: the merged-row count is
    unknown without an extra action over the deduped source; callers that
    need it can count ``latest_per_key(source, ...)`` themselves.

    CONTRACT: ``partition_col`` must be functionally dependent on ``keys``
    (here: date = date(ts), ts ∈ PK). If a key could appear under two
    partition values, a source row in a partition the target stores that
    key elsewhere in would insert a duplicate instead of updating —
    partition-scoped merging cannot see across partitions by design
    (that's what keeps it O(touched partitions)). The property suite
    demonstrates the violation mode (tests/test_property.py).
    """
    keys = list(keys)
    update_cols = list(update_cols)
    bad = set(update_cols) & set(keys)
    if bad:
        raise ValueError(f"update_cols may not overlap keys: {sorted(bad)}")

    local = "://" not in target_path or target_path.startswith("file:")
    if lock and local:
        with writer_lock(target_path.removeprefix("file:")):
            return _merge_impl(
                spark, target_path, source, keys, update_cols, order_by, partition_col
            )
    # non-local URI (object store): no atomic create-if-absent primitive —
    # coordination is the deployment's job (see module docstring)
    return _merge_impl(spark, target_path, source, keys, update_cols, order_by, partition_col)


def _merge_impl(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str],
    order_by: Sequence[Column | str],
    partition_col: str,
) -> int:
    src = latest_per_key(source, keys=keys, order_by=list(order_by))
    src = src.select(*source.columns)  # canonical column order

    if not _exists(spark, target_path):
        src.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return -1  # unknown without an extra action; caller can count

    target = spark.read.parquet(target_path)

    # Only partitions the source touches participate (partition pruning on
    # this IN-filter keeps the merge O(touched partitions)).
    touched = [r[0] for r in src.select(partition_col).distinct().collect()]
    tgt_slice = target.filter(F.col(partition_col).isin(touched))

    non_update = [c for c in target.columns if c not in update_cols and c not in keys]
    matched = tgt_slice.alias("t").join(src.alias("s"), on=keys, how="inner").select(
        *[F.col(k) for k in keys],
        *[F.col(f"s.{c}").alias(c) for c in update_cols],
        *[F.col(f"t.{c}").alias(c) for c in non_update],
    )
    unmatched_tgt = tgt_slice.join(src, on=keys, how="left_anti")
    inserts = src.join(tgt_slice, on=keys, how="left_anti")

    result = (
        unmatched_tgt.select(*target.columns)
        .unionByName(matched.select(*target.columns))
        .unionByName(inserts.select(*target.columns))
    )

    # Self-referential overwrite: the plan reads target_path. Dynamic
    # partition overwrite stages output before committing, but Spark still
    # refuses plans that read the path being overwritten — break the
    # lineage with a localCheckpoint (kept off the driver, spilled to
    # executor storage).
    result = result.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        result.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return -1
