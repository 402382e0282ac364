#!/usr/bin/env python
"""Txlog MAINTENANCE surface at scale (r10 verdict ask #5): the r10
four-SF curve covered the read/merge paths (u06/u13); this leg measures
what compaction (u14), range-clustered OPTIMIZE (u16), and
merge-on-read deletion vectors + vacuum (u17/u18) cost as the table
grows — with the two invariants the docstrings assert turned into
numbers:

- **cost is LIVE BYTES, not history**: each leg records the physical
  bytes of the live set the rewrite reads and the bytes it writes,
  alongside wall time — the slope should track those bytes;
- **log traffic is COMMIT COUNT, not table size**: every leg runs its
  commits through a counting CommitStore; the {puts, gets, lists}
  triple must be IDENTICAL at every SF (the u13/r10 property, now
  pinned for the maintenance ops too);
- **DV sidecars are O(deleted keys)**: u17's leg records sidecar bytes
  vs table bytes — the merge-on-read bargain in one ratio.

Usage: python scripts/scale_txlog_maintenance.py [out_json] [--sfs=...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/_scale/sf1",
    "sf4": "/root/repo/_scale/sf4",
    "sf16": "/root/repo/_scale/sf16",
}


def _counting_store():
    from dibimbing_case_study_etl_spark.operators.txlog import CommitStore

    class CountingStore(CommitStore):
        def __init__(self):
            self.puts = self.gets = self.lists = 0

        def put_if_absent(self, target, payload):
            self.puts += 1
            return super().put_if_absent(target, payload)

        def list_names(self, log_dir):
            self.lists += 1
            return super().list_names(log_dir)

        def read(self, target):
            self.gets += 1
            return super().read(target)

    return CountingStore()


def _live_bytes(table) -> int:
    return sum((Path(table.root) / f.path).stat().st_size for f in table.live_files())


def _dir_bytes(root: Path, pattern: str) -> int:
    return sum(
        p.stat().st_size for d in root.glob(pattern) for p in d.glob("*.parquet")
    )


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def run_u14(spark, customer, store) -> dict:
    """Bin-pack compaction: 3 fragmented appends -> compact(2)."""
    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable

    root = tempfile.mkdtemp(prefix="curve_u14_")
    try:
        t = TxLogTable.create(root, store=store)
        append_s, _ = _timed(
            lambda: [
                t.append(customer.filter(F.col("k") % 3 == r), key_col="k", target_files=4)
                for r in (0, 1, 2)
            ]
        )
        pre_bytes = _live_bytes(t)
        n_pre = len(t.live_files())
        compact_s, _ = _timed(lambda: t.compact(spark, key_col="k", target_files=2))
        return {
            "append_s": append_s,
            "compact_s": compact_s,
            "files_pre": n_pre,
            "files_post": len(t.live_files()),
            "live_bytes_read": pre_bytes,
            "live_bytes_written": _live_bytes(t),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_u16(spark, customer, store) -> dict:
    """Range-clustered OPTIMIZE: hash-spread appends -> cluster_by."""
    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable

    root = tempfile.mkdtemp(prefix="curve_u16_")
    try:
        t = TxLogTable.create(root, store=store)
        append_s, _ = _timed(
            lambda: [
                t.append(
                    customer.filter(F.col("k") % 3 == r).repartition(4, "k"),
                    key_col="k",
                )
                for r in (0, 1, 2)
            ]
        )
        pre_bytes = _live_bytes(t)

        bounds = customer.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).first()
        span = bounds["hi"] - bounds["lo"]
        plo = bounds["lo"] + int(span * 0.47)
        phi = bounds["lo"] + int(span * 0.50)

        def overlap(files):
            return sum(
                1
                for f in files
                if f.min_key is None or not (f.max_key < plo or f.min_key > phi)
            )

        ov_pre, n_pre = overlap(t.live_files()), len(t.live_files())
        cluster_s, _ = _timed(
            lambda: t.compact(spark, key_col="k", target_files=4, cluster_by="k")
        )
        return {
            "append_s": append_s,
            "cluster_compact_s": cluster_s,
            "files_pre": n_pre,
            "probe_overlap_pre": ov_pre,
            "probe_overlap_post": overlap(t.live_files()),
            "live_bytes_read": pre_bytes,
            "live_bytes_written": _live_bytes(t),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def run_u17(spark, customer, store) -> dict:
    """Merge-on-read DVs: append -> delete_where -> compact -> vacuum."""
    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable

    root = tempfile.mkdtemp(prefix="curve_u17_")
    try:
        t = TxLogTable.create(root, store=store)
        append_s, _ = _timed(lambda: t.append(customer, key_col="k", target_files=4))
        table_bytes = _live_bytes(t)
        delete_s, _ = _timed(lambda: t.delete_where(spark, F.col("k") % 7 == 0, "k"))
        dv_bytes = _dir_bytes(Path(root), "dv-*")
        read_s, n_visible = _timed(lambda: t.read(spark).count())
        compact_s, _ = _timed(lambda: t.compact(spark, key_col="k", target_files=4))
        vacuum_s, removed = _timed(
            lambda: t.vacuum(as_of_retained=t.latest_version(), min_file_age_s=0)
        )
        return {
            "append_s": append_s,
            "delete_where_s": delete_s,
            "mor_read_s": read_s,
            "compact_s": compact_s,
            "vacuum_s": vacuum_s,
            "table_bytes": table_bytes,
            "dv_sidecar_bytes": dv_bytes,
            "dv_to_table_ratio": round(dv_bytes / table_bytes, 5),
            "rows_visible": n_visible,
            "vacuumed_files": len(removed),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = args[0] if args else "/root/repo/_scale/curve_txlog_maint_r11.json"
    sfs = list(SFS)
    for a in sys.argv[1:]:
        if a.startswith("--sfs="):
            sfs = [s for s in a[len("--sfs=") :].split(",") if s in SFS]

    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.catalog import load_table
    from dibimbing_case_study_etl_spark.session import get_spark

    spark = get_spark(app_name="scale-txlog-maint", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for sf in sfs:
        customer = load_table(spark, SFS[sf], "customer").select(
            F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("p")
        )
        n = customer.count()
        for name, fn in (("u14", run_u14), ("u16", run_u16), ("u17", run_u17)):
            store = _counting_store()
            leg = fn(spark, customer, store)
            row = {
                "leg": name,
                "sf": sf,
                "rows": n,
                **leg,
                "store_calls": {
                    "puts": store.puts,
                    "gets": store.gets,
                    "lists": store.lists,
                },
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(out_json, "w") as fh:
        json.dump(
            {"generated_by": "scripts/scale_txlog_maintenance.py", "legs": rows},
            fh,
            indent=1,
        )
    print(json.dumps({"wrote": out_json, "n_legs": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
