"""merge_upsert unit tests: update-column split (U1 vs U2 semantics),
in-batch arbitration, partition preservation, idempotency."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.operators.merge_upsert import merge_upsert

SCHEMA = "k int, date date, hour int, val double, load_ds date, seq int"


def df_of(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


D = dt.date


@pytest.fixture()
def target_path(tmp_path):
    return str(tmp_path / "target")


def seed(spark, target_path):
    base = df_of(
        spark,
        [
            (1, D(2025, 1, 1), 0, 10.0, D(2025, 1, 1), 0),
            (2, D(2025, 1, 1), 1, 20.0, D(2025, 1, 1), 0),
            (3, D(2025, 1, 2), 2, 30.0, D(2025, 1, 1), 0),
        ],
    )
    base.write.mode("overwrite").partitionBy("date").parquet(target_path)


def test_update_col_split(spark, target_path):
    """Only update_cols take source values on match; other columns keep
    the target's (the L1 vs L2 distinction, SURVEY §2.6)."""
    seed(spark, target_path)
    src = df_of(spark, [(1, D(2025, 1, 1), 99, 11.5, D(2025, 1, 2), 0)])
    merge_upsert(
        spark, target_path, src,
        keys=["k"], update_cols=["val", "load_ds"],
        order_by=[F.desc("load_ds")], partition_col="date",
    )
    out = {r.k: r for r in spark.read.parquet(target_path).collect()}
    assert out[1].val == 11.5 and out[1].load_ds == D(2025, 1, 2)
    assert out[1].hour == 0  # NOT updated (source said 99)
    assert out[2].val == 20.0 and out[3].val == 30.0  # untouched


def test_insert_new_keys_and_preserve_other_partitions(spark, target_path):
    seed(spark, target_path)
    src = df_of(spark, [(4, D(2025, 1, 1), 3, 40.0, D(2025, 1, 2), 0)])
    merge_upsert(
        spark, target_path, src,
        keys=["k"], update_cols=["val", "load_ds"],
        order_by=[F.desc("load_ds")], partition_col="date",
    )
    out = spark.read.parquet(target_path)
    assert out.count() == 4
    # k=3 lives in partition 2025-01-02, untouched by this merge
    assert out.filter("k = 3").first().val == 30.0


def test_in_batch_duplicate_arbitration(spark, target_path):
    """Duplicate keys within one source batch: first row under order_by
    wins (here: highest seq — 'last in batch order', `load:140-147`)."""
    seed(spark, target_path)
    src = df_of(
        spark,
        [
            (1, D(2025, 1, 1), 0, 111.0, D(2025, 1, 2), 0),
            (1, D(2025, 1, 1), 0, 222.0, D(2025, 1, 2), 1),
        ],
    )
    merge_upsert(
        spark, target_path, src,
        keys=["k"], update_cols=["val", "load_ds"],
        order_by=[F.desc("load_ds"), F.desc("seq")], partition_col="date",
    )
    assert spark.read.parquet(target_path).filter("k = 1").first().val == 222.0


def test_rerun_converges(spark, target_path):
    seed(spark, target_path)
    src = df_of(spark, [(2, D(2025, 1, 1), 1, 21.0, D(2025, 1, 3), 0)])
    for _ in range(2):
        merge_upsert(
            spark, target_path, src,
            keys=["k"], update_cols=["val", "load_ds"],
            order_by=[F.desc("load_ds")], partition_col="date",
        )
    out = spark.read.parquet(target_path)
    assert out.count() == 3
    assert out.filter("k = 2").first().val == 21.0


def test_update_cols_overlapping_keys_rejected(spark, target_path):
    seed(spark, target_path)
    src = df_of(spark, [(1, D(2025, 1, 1), 0, 1.0, D(2025, 1, 1), 0)])
    with pytest.raises(ValueError, match="overlap"):
        merge_upsert(
            spark, target_path, src,
            keys=["k"], update_cols=["k", "val"],
            order_by=[F.desc("load_ds")],
        )


def test_writer_lock_excludes_concurrent_merges(spark, target_path, tmp_path):
    """Single-writer contract: a held lock makes a second merge raise
    ConcurrentWriterError instead of silently interleaving partition
    overwrites; the lock is released after success and reclaimed when
    stale (crash orphan)."""
    import os
    import time

    import pytest

    from dibimbing_case_study_etl_spark.operators.merge_upsert import (
        ConcurrentWriterError,
        merge_upsert,
        writer_lock,
    )

    path = str(tmp_path / "locked_tbl")
    src = spark.createDataFrame(
        [(1, "d1", 1.0)], "k int, date string, val double"
    )

    with writer_lock(path):
        with pytest.raises(ConcurrentWriterError, match="serialize"):
            merge_upsert(
                spark, path, src, keys=["k"], update_cols=["val"],
                order_by=["val"], partition_col="date",
            )
    # lock released → merge proceeds, and releases its own lock after
    merge_upsert(
        spark, path, src, keys=["k"], update_cols=["val"],
        order_by=["val"], partition_col="date",
    )
    assert not os.path.exists(path + ".__writer_lock")
    assert spark.read.parquet(path).count() == 1

    # a crash-orphaned lock older than stale_sec is reclaimed
    lock = path + ".__writer_lock"
    open(lock, "w").write("{}")
    old = time.time() - 7200
    os.utime(lock, (old, old))
    merge_upsert(
        spark, path, src, keys=["k"], update_cols=["val"],
        order_by=["val"], partition_col="date",
    )
    assert not os.path.exists(lock)
