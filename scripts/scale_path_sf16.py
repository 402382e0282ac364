#!/usr/bin/env python
"""Four-point scale-path curve: run the DESIGNATED scale paths (the
operators a 100 TB pipeline would actually deploy — LSH/banded/bloom/
salted kernels, never the exact quadratic baselines) at sf0.1 / sf1 /
sf4 / sf16 in ONE warm session. sf16 = 160× the driver SF (~1M docs,
~24M lineitem rows): the point is to show the scale paths' cost tracks
OUTPUT and DATA, not pair-space, two decades past the driver scale.

Usage: python scripts/scale_path_sf16.py [out_json] [--only=prefix,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/_scale/sf1",
    "sf4": "/root/repo/_scale/sf4",
    "sf16": "/root/repo/_scale/sf16",
}

# The scale paths + a relational/events/codec spine. Deliberately NO
# exact pair-enumeration baselines (d02/d10/d20/g01/g02/s09 — their
# cost is pair-space by definition; SCALE.md's three-point curve covers
# them with the emission-bound analysis). d08 joined in r8: its r7 2D
# -salt-cell + profile-prune kernel bounds per-task work regardless of
# block degeneracy, which makes it a deployed kernel, not an exact
# baseline. t36 joined in r8: it composes the d03 LSH candidates with
# d06 label propagation — the heaviest composite never measured past
# sf4.
QUERIES = [
    "d01_dedup_exact",
    "d03_dedup_minhash_lsh",
    "d08_edit_distance_pairs",
    "t36_cluster_aware_split",
    "d13_bloom_decontamination",
    "m06_phash_neardup",
    "m08_png_phash_neardup",
    "t26_substring_dedup_spans",
    "t02_quality_score",
    "s02_ann_lsh_topk",
    "p01_training_data_pipeline",
    "q01_pricing_summary",
    "q26_events_hourly",
    "q23_dedup_latest_per_key",
    "f07_cusum_changepoint",
    "t48_countmin_heavy_hitters",
    # r9 (verdict ask #8): the bench's most expensive row joins the curve.
    # Its scale cost is the lineitem edge-table distinct (the frontiers
    # stay (seed,node)-bounded and the seeds live in replica 0 of the
    # sharded scale data), so the slope should track the scan, not the
    # graph.
    "g03_supply_chain_reach",
    # r10 (verdict ask #5): the txlog family at scale — the store-backed
    # read path (paginated ListObjectsV2 + GetObject) was rewired in r9
    # but had no scale cell. The data plane is distributed parquet; the
    # leg also records the store-call counts (LAST_U13_STORE_CALLS) to
    # prove log traffic tracks COMMIT COUNT, not table size.
    "u06_txlog_merge_timetravel",
    "u13_txlog_object_store_roundtrip",
]


def _drain_shuffle_dirs(spark, budget_s: float = 120.0, target_free_gb: float = 45.0) -> None:
    """Release a finished query's disk footprint before the next leg.

    TWO mechanisms hold disk here, and they need different levers:

    - CACHE blocks (``_materialize`` persists intermediates
      MEMORY_AND_DISK): the session CacheManager keeps STRONG references,
      so no amount of GC frees them — ``clearCache()`` is the only
      release. Cross-query reuse is nil (each query rebuilds its own
      subtree), so clearing between legs costs nothing. This was the r8
      ENOSPC: d08's and t36's spilled caches pinned ~50 GB that the r7
      GC nudge could never reclaim.
    - SHUFFLE files: freed by the async ContextCleaner only after the
      ShuffleDependency objects are garbage-collected — so GC-nudge both
      runtimes in a loop until the disk actually drains or the budget
      expires (a single fixed sleep races the cleaner).
    """
    import gc
    import shutil

    spark.catalog.clearCache()
    deadline = time.monotonic() + budget_s
    while True:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        free_gb = shutil.disk_usage("/tmp").free / 1e9
        if free_gb >= target_free_gb or time.monotonic() > deadline:
            print(json.dumps({"drain_free_gb": round(free_gb, 1)}), flush=True)
            return


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = args[0] if args else "/root/repo/_scale/curve_sf16.json"
    only = [
        p
        for a in sys.argv[1:]
        if a.startswith("--only=")
        for p in a[len("--only=") :].split(",")
        if p
    ]
    queries = [q for q in QUERIES if not only or any(q.startswith(p) for p in only)]

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    # Deployment posture (r8 verdict ask #5): the scale path runs the LSH
    # family CAPPED — a genuinely degenerate web-scale bucket (>65536
    # DISTINCT members post-canonicalization) downgrades to star emission
    # so pair OUTPUT stays corpus-linear (kernel memory is strip-bounded
    # either way). At these SFs no synthetic bucket comes near the cap,
    # so measured results are identical to exact; the per-leg downgrade
    # count is logged below to prove it (no silent approximation).
    import dibimbing_case_study_etl_spark.operators.dedup as _dd

    os.environ[_dd._BUCKET_CAP_ENV] = "65536"
    print(json.dumps({"lsh_bucket_cap": 65536}), flush=True)

    registry = load_all()
    spark = get_spark(app_name="scale-path-sf16", shuffle_partitions=128)

    def _calibration(spark) -> float:
        # Fixed-work, data-independent throttle canary (bench.py's r8
        # pattern): the hypervisor varies ~2x between sessions, so each
        # leg records what a CONSTANT workload costs right then —
        # separating VM weather from genuine slope in cross-round reads.
        from pyspark.sql import functions as F

        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            (
                spark.range(2_000_000)
                .select((F.col("id") % 9973).alias("k"), (F.col("id") * 0.001).alias("v"))
                .groupBy("k")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
                .orderBy("s")
                .write.mode("overwrite")
                .format("noop")
                .save()
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    curve: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        curve[sf_label] = {}
        curve[sf_label]["_calibration_sec"] = _calibration(spark)
        # warmup pass amortizes whole-session JIT into the first leg
        if sf_label == "sf0.1":
            for name in queries:
                registry[name].build(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
        for name in queries:
            best = None
            # the accumulator is a module global that only LSH-calling
            # queries set; without this reset a non-LSH leg following an
            # LSH leg would record the PREVIOUS query's stale count as
            # its own lsh_downgraded_buckets audit row
            _dd.LAST_LSH_DOWNGRADED_BUCKETS = None
            for run_i in range(2):
                t0 = time.perf_counter()
                registry[name].build(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                if sf_label == "sf16" and run_i == 0:
                    # drain BETWEEN the two runs at sf16: (a) run 2 on a
                    # heavy pipeline otherwise stacks its shuffles/caches
                    # on run 1's still-pinned ones and ENOSPCs the box
                    # (p01: ~60 GB per run); (b) Spark's CacheManager
                    # matches canonicalized plans, so run 2 would read
                    # run 1's _materialize caches and report a
                    # cache-warm fiction (r8's p01 sf16 "19 s" vs ~350 s
                    # honest cold) — min-of-2 at sf16 is now min of two
                    # COLD runs, damping throttle only.
                    _drain_shuffle_dirs(spark, budget_s=240.0, target_free_gb=70.0)
            curve[sf_label][name] = round(best, 2)
            leg = {"sf": sf_label, "q": name, "sec": curve[sf_label][name]}
            if _dd.LAST_LSH_DOWNGRADED_BUCKETS is not None:
                # downgrade audit for the capped LSH legs (d03/t36/p01/...)
                leg["lsh_downgraded_buckets"] = int(
                    _dd.LAST_LSH_DOWNGRADED_BUCKETS.value
                )
                curve[sf_label][f"_{name}_lsh_downgraded_buckets"] = leg[
                    "lsh_downgraded_buckets"
                ]
            if name.startswith("u13"):
                # store-call audit (r10 ask #5): the commit-log protocol's
                # API traffic must track commit count, not data size —
                # identical counts at every SF is the pass condition
                import dibimbing_case_study_etl_spark.queries.llm_ops11 as _l11

                if _l11.LAST_U13_STORE_CALLS is not None:
                    leg["store_calls"] = dict(_l11.LAST_U13_STORE_CALLS)
                    curve[sf_label][f"_{name}_store_calls"] = leg["store_calls"]
            print(json.dumps(leg), flush=True)
            if sf_label in ("sf4", "sf16"):
                # see _drain_shuffle_dirs: clearCache() releases the
                # pinned persists (un-GC-able), the GC loop releases the
                # shuffle files. sf4 drains too — its caches would
                # otherwise still be resident when the sf16 leg starts.
                # sf16 target raised 45→70 GB (r9): dedup_clusters'
                # per-round tables are localCheckpoint BLOCKS now (lineage
                # truncation — see operators/dedup.py), which clearCache
                # does not touch; they drain through the GC loop instead,
                # and a 45 GB stop left too little headroom for p01's own
                # ~60 GB sf16 working set (ENOSPC mid-leg, two back-to-back
                # runs). The GC loop reclaims them fine — it just has to
                # keep going past the old target.
                _drain_shuffle_dirs(
                    spark,
                    budget_s=(240.0 if sf_label == "sf16" else 15.0),
                    target_free_gb=(70.0 if sf_label == "sf16" else 45.0),
                )
        if sf_label in ("sf0.1", "sf1"):
            _drain_shuffle_dirs(spark, budget_s=15.0)

    with open(out_json, "w") as f:
        json.dump(curve, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
