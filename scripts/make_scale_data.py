#!/usr/bin/env python
"""Synthesize larger scale factors from the driver's sf0.1 tables for the
scale sweep (SCALE.md). NOT test data — correctness runs only ever use the
driver-generated /root/testdata; this exists solely to measure how the
engine's plans behave as data grows 10–40×.

Method: replicate every table R times with consistent key remapping
(foreign keys shift together, so join fan-out/selectivity per key is
preserved — each replica is a disjoint "shard" of a bigger world, the same
way TPC-H scale factors grow). Fixed dims (nation/region) stay fixed.
Document text gets a per-replica suffix so near/exact-dup structure doesn't
degenerate into every doc having R byte-identical copies; events keep
their timestamps (R× users → R× sessionize partitions over the same
window, which is exactly how event volume grows in production).

Each table is written as a DIRECTORY of R parquet files (one per replica):
multi-file layout is what a real table at this size looks like, and it
gives Spark file-granular scan parallelism.

Usage: python scripts/make_scale_data.py [R] [out_root]
  R defaults to 10 (sf0.1 → sf1); out_root defaults to /root/repo/_scale/sf1
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, {column: stride_key}) — every keyed column shifts by
# replica_index * stride[stride_key]; strides come from the source max+1 so
# replicas never collide.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FIXED = ("nation", "region")


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_scale/sf1"

    tables = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet")) for t in KEYED}
    strides = {
        "cust": int(pc.max(tables["customer"]["c_custkey"]).as_py()) + 1,
        "order": int(pc.max(tables["orders"]["o_orderkey"]).as_py()) + 1,
        "part": int(pc.max(tables["part"]["p_partkey"]).as_py()) + 1,
        "supp": int(pc.max(tables["supplier"]["s_suppkey"]).as_py()) + 1,
        "event": int(pc.max(tables["events"]["event_id"]).as_py()) + 1,
        "user": int(pc.max(tables["events"]["user_id"]).as_py()) + 1,
        "doc": int(pc.max(tables["documents"]["doc_id"]).as_py()) + 1,
        "vec": int(pc.max(tables["embeddings"]["vec_id"]).as_py()) + 1,
    }

    for t, keycols in KEYED.items():
        src = tables[t]
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        for i in range(r):
            tab = src
            for col, sk in keycols.items():
                idx = tab.schema.get_field_index(col)
                shifted = pc.add(tab[col], pa.scalar(i * strides[sk], type=tab[col].type))
                tab = tab.set_column(idx, tab.schema.field(idx), shifted)
            if t == "documents" and i > 0:
                idx = tab.schema.get_field_index("text")
                perturbed = pc.binary_join_element_wise(
                    tab["text"].combine_chunks(), pa.scalar(f"r{i}"), " "
                )
                tab = tab.set_column(idx, tab.schema.field(idx), perturbed)
            pq.write_table(tab, os.path.join(d, f"part-{i:05d}.parquet"))
        print(f"{t}: {src.num_rows} rows x {r} -> {d}")

    for t in FIXED:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tab, os.path.join(d, "part-00000.parquet"))
        print(f"{t}: {tab.num_rows} rows (fixed dim) -> {d}")


if __name__ == "__main__":
    main()
