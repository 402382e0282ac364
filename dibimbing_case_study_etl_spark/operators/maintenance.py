"""Table maintenance: small-file compaction.

At 100 TB the silent killer is file-count growth — every incremental
merge/append leaves another handful of files per partition, and a year
later each scan pays millions of opens and the driver pays listing time.
Compaction rewrites each partition's files into ~target-size outputs.

The layout walk is driver-side *metadata only* (file names + sizes —
never data); the rewrite itself is a distributed read → repartition →
write per leaf. The swap is local-FS rename; an object-store deployment
would commit through a manifest/rename protocol instead (same plan
shape, different committer).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


_TMP_SUFFIX = "__compact_tmp"
_OLD_SUFFIX = "__compact_old"


def _leaf_dirs(path: str) -> list[str]:
    """Directories that directly hold parquet files (partition leaves, or
    the root itself for unpartitioned layouts). Work dirs left by a
    crashed compaction run (``*__compact_tmp``/``*__compact_old``) are
    never treated as leaves — they hold duplicate/stale copies of a real
    leaf's data."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [
            d for d in dirnames if not d.endswith((_TMP_SUFFIX, _OLD_SUFFIX))
        ]
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return leaves


def _recover_stale_workdirs(path: str) -> None:
    """Clean up after a crashed compaction run, restoring the invariant
    that every leaf exists exactly once:

    - ``X__compact_old`` present and ``X`` missing → the crash hit between
      the two renames; rename the old data back into place.
    - otherwise stale ``X__compact_tmp``/``X__compact_old`` dirs are
      leftovers whose live twin exists → delete them.
    """
    for dirpath, dirnames, _filenames in os.walk(path):
        for d in list(dirnames):
            if not d.endswith((_TMP_SUFFIX, _OLD_SUFFIX)):
                continue
            full = os.path.join(dirpath, d)
            if d.endswith(_OLD_SUFFIX):
                leaf = full[: -len(_OLD_SUFFIX)]
                if not os.path.exists(leaf):
                    os.rename(full, leaf)
                    dirnames.remove(d)
                    continue
            shutil.rmtree(full)
            dirnames.remove(d)


def _dir_bytes(dirpath: str) -> int:
    return sum(
        e.stat().st_size
        for e in os.scandir(dirpath)
        if e.is_file() and e.name.endswith(".parquet")
    )


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact every partition leaf under ``path`` to
    ``ceil(leaf_bytes / target_file_bytes)`` files.

    Leaves already at or under the target count are skipped, so repeated
    runs are idempotent and cheap. Returns ``{leaf: (files_before,
    files_after)}`` for the leaves rewritten.

    Crash safety: a run starts by recovering any ``*__compact_tmp`` /
    ``*__compact_old`` work dirs a previous crash left behind (restoring
    the leaf if the crash hit between the swap renames, deleting stale
    copies otherwise), and the layout walk never mistakes a work dir for
    a partition leaf.
    """
    _recover_stale_workdirs(path)
    results: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_dirs(path):
        files_before = sum(
            1 for e in os.scandir(leaf) if e.is_file() and e.name.endswith(".parquet")
        )
        n_target = max(1, math.ceil(_dir_bytes(leaf) / target_file_bytes))
        if files_before < min_files_to_compact or files_before <= n_target:
            continue
        tmp = leaf + _TMP_SUFFIX
        (
            spark.read.parquet(leaf)
            .repartition(n_target)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = leaf + _OLD_SUFFIX
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        files_after = sum(
            1 for e in os.scandir(leaf) if e.is_file() and e.name.endswith(".parquet")
        )
        results[leaf] = (files_before, files_after)
    return results
