#!/usr/bin/env python
"""Streaming scale curve (r10 verdict ask #2): put the st02/st03
streaming family on the measured curve the batch families already have.

For each SF (sf0.1 / sf1 / sf4) and each topology (st02 native session
windows, st03 watermark-bounded stream-stream interval join) this runs
the SAME two-micro-batch harness the registry queries use — but with a
``noop`` sink (no driver materialization; the question is operator
state, not result transfer) — and records, per micro-batch, the state
-store metrics Structured Streaming itself reports (``numRowsTotal``,
``numRowsUpdated``, ``numRowsRemoved``/watermark evictions, sink
``numOutputRows``, ``durationMs``) plus split wall times for fixture
writes vs stream processing. A NULL leg per topology (empty source,
identical checkpoint/trigger/plumbing) measures the fixed harness cost
so the curve can subtract it: what remains is the kernel.

The claims under test (docstrings of ``llm_ops18.py:st02/st03``):
- st02 state is O(sessions), not O(events) — ``numRowsTotal`` after the
  last batch ≈ session count, and grows with DATA, sublinearly wrt
  events-per-user density;
- st03 state is O(events in the horizon window), not O(stream) —
  ``numRowsRemoved`` > 0 proves watermark eviction happens, and the
  final buffered total stays far below total input events.

Usage: python scripts/scale_streaming.py [out_json] [--sfs=sf0.1,sf1,sf4]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/_scale/sf1",
    "sf4": "/root/repo/_scale/sf4",
}

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)


def _state_summary(progress: list[dict]) -> list[dict]:
    out = []
    for p in progress:
        ops = [
            {
                "op": so.get("operatorName"),
                "rows_total": so.get("numRowsTotal"),
                "rows_updated": so.get("numRowsUpdated"),
                "rows_removed": so.get("numRowsRemoved"),
                "mem_used_bytes": so.get("memoryUsedBytes"),
            }
            for so in (p.get("stateOperators") or [])
        ]
        if not ops and p.get("numInputRows", 0) == 0:
            continue  # empty no-data ticks add nothing
        out.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "sink_rows": (p.get("sink") or {}).get("numOutputRows"),
                "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "state": ops,
            }
        )
    return out


def _run_leg(spark, topology: str, events_df, null_leg: bool) -> dict:
    """One two-micro-batch streaming run; events_df may be None (null)."""
    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix=f"stream_curve_{topology}_")
    ckpt = tempfile.mkdtemp(prefix=f"stream_curve_ckpt_")
    name = f"curve_{topology}_{uuid.uuid4().hex[:8]}"
    empty = spark.createDataFrame([], _SCHEMA)
    try:
        t0 = time.perf_counter()
        if null_leg:
            batches = [empty, empty]
        elif topology == "st02":
            # even/odd event_id split: sessions merge across the boundary
            batches = [
                events_df.filter(F.col("event_id") % 2 == 0),
                events_df.filter(F.col("event_id") % 2 == 1),
            ]
        else:
            # median event-time split: in-order arrival, cross-batch matches
            split = events_df.agg(
                F.expr("percentile(cast(ts as long), 0.5)").alias("m")
            ).first()["m"]
            batches = [
                events_df.filter(F.col("ts").cast("long") <= split),
                events_df.filter(F.col("ts").cast("long") > split),
            ]
        batches[0].write.mode("overwrite").parquet(src)
        fixture1_s = time.perf_counter() - t0

        stream = spark.readStream.schema(_SCHEMA).parquet(src + "/*.parquet")
        if topology == "st02":
            plan = (
                stream.groupBy(
                    F.session_window("ts", "30 minutes").alias("win"), "user_id"
                ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
            )
            mode = "complete"
        else:
            from dibimbing_case_study_etl_spark.streaming.events_stream import (
                view_purchase_attribution,
            )

            plan = view_purchase_attribution(
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "purchase"),
                horizon="30 minutes",
            )
            mode = "append"

        t0 = time.perf_counter()
        q = (
            plan.writeStream.outputMode(mode)
            .option("checkpointLocation", ckpt)
            .format("noop")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            batch1_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            batches[1].write.mode("append").parquet(src)
            fixture2_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            q.processAllAvailable()
            batch2_s = time.perf_counter() - t0
            progress = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        return {
            "fixture_write_s": round(fixture1_s + fixture2_s, 3),
            "batch1_s": round(batch1_s, 3),
            "batch2_s": round(batch2_s, 3),
            "stream_s": round(batch1_s + batch2_s, 3),
            "progress": _state_summary(progress),
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = args[0] if args else "/root/repo/_scale/curve_streaming_r11.json"
    sfs = list(SFS)
    for a in sys.argv[1:]:
        if a.startswith("--sfs="):
            sfs = [s for s in a[len("--sfs=") :].split(",") if s in SFS]

    from dibimbing_case_study_etl_spark.catalog import load_table
    from dibimbing_case_study_etl_spark.session import get_spark

    spark = get_spark(app_name="scale-streaming", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for topology in ("st02", "st03"):
        # fixed-cost leg first: empty source, identical plumbing
        null = _run_leg(spark, topology, None, null_leg=True)
        null_row = {"leg": f"{topology}_null", "sf": None, "rows_in": 0, **null}
        rows.append(null_row)
        print(json.dumps(null_row), flush=True)
        for sf in sfs:
            events = load_table(spark, SFS[sf], "events").select(
                "event_id", "ts", "user_id", "event_type", "value"
            )
            n = events.count()
            leg = _run_leg(spark, topology, events, null_leg=False)
            row = {"leg": topology, "sf": sf, "rows_in": n, **leg}
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(out_json, "w") as fh:
        json.dump({"generated_by": "scripts/scale_streaming.py", "legs": rows}, fh, indent=1)
    print(json.dumps({"wrote": out_json, "n_legs": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
