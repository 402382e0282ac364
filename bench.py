#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]``.

Output contract (the driver captures only the LAST ~2000 chars of stdout
and parses the final JSON line — r7's single 31-query line outgrew that
window and the round lost its headline number):

1. a FULL JSON line with per-query best + mean dicts (may exceed the
   driver's tail window; also dumped to ``_scale/bench_full_last.json``);
2. a final COMPACT JSON line — ``{"metric", "value", "unit", "sf",
   "runs", "value_mean", "calibration_sec", "nqueries"}`` — guaranteed
   to fit any tail buffer regardless of headline-set size.

``calibration_sec`` is a fixed-work, data-independent canary (the warmup
join/window/explode pipeline, timed before every pass plus once after the
last; min reported, all samples in ``calibration_runs``) so uniform
hypervisor throttles — and their within-session drift — are separable
from plan regressions in round-over-round reads.

r12 additions (both JSON lines, outside every timed region):
``default_parallelism`` / ``shuffle_partitions`` prove the effective core
count (the r11 scaling block could not distinguish "env ignored" from
"queries too small to show cores"), and the full line's
``cpu_probe_*`` fields time one fixed CPU-bound pipeline at 1 partition
vs ``defaultParallelism`` partitions — in-artifact evidence that the
session engages its cores even when every sf0.1 query is overhead-bound.
No existing field changed; the timed methodology is untouched.

Each query is materialized with the no-op sink (full computation, no
result serialization cost); timings exclude session startup but include
planning.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = load_all()
    bench_specs = {n: s for n, s in registry.items() if s.bench}

    # Warm the session outside the timed region — the model is a cluster
    # with warm executors: JIT'd Catalyst/janino paths, running Python
    # workers, and touched FS metadata. Uses synthetic rows and the tiny
    # smoke-scale directory only; never the benched sf_dir.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    def _calibration_pipeline() -> None:
        # Fixed-work, data-independent pipeline (synthetic range input):
        # join + window + explode + hash-agg + sort.  Used twice — untimed
        # as JIT warmup here, then timed below as the throttle canary.
        df = spark.range(200_000).select(
            "id",
            (F.col("id") % 97).alias("k"),
            (F.col("id") * 0.001).alias("v"),
        )
        dim = spark.range(97).select(F.col("id").alias("k"), F.lit("x").alias("name"))
        (
            df.join(dim, "k")
            .withColumn("rn", F.row_number().over(W.partitionBy("k").orderBy("id")))
            .withColumn("arr", F.array("id", "k"))
            .select("*", F.explode("arr").alias("e"))
            .groupBy("k")
            .agg(
                F.sum(F.call_function("rint", F.col("v") * 100).cast("bigint")).alias("s"),
                F.avg("v").alias("a"),
                F.count(F.lit(1)).alias("c"),
            )
            .orderBy("s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    _calibration_pipeline()
    df = spark.range(200_000).select(
        "id",
        (F.col("id") % 97).alias("k"),
        (F.col("id") * 0.001).alias("v"),
    )
    df.mapInPandas(lambda it: it, schema="id long, k long, v double").groupBy(
        "k"
    ).applyInPandas(lambda p: p.head(1), schema="id long, k long, v double").write.mode(
        "overwrite"
    ).format("noop").save()
    smoke = os.path.join(os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata", "sf0.001")
    if os.path.isdir(smoke):
        spark.read.parquet(os.path.join(smoke, "lineitem.parquet")).selectExpr(
            "sum(l_quantity)"
        ).collect()
        # Run each headline query once at smoke scale (sf0.001, ~1000×
        # smaller than the benched data) so its specific plans are
        # codegen-compiled and JIT'd before timing — the per-query costs
        # below then measure steady-state execution, not one-time janino
        # compilation. The benched sf_dir itself is never touched here.
        for name in sorted(bench_specs):
            bench_specs[name].build(spark, smoke).write.mode("overwrite").format(
                "noop"
            ).save()

    # Interleaved passes, report each query's best — the build VM is
    # hypervisor-throttled with 10× run-to-run swings on identical code, so
    # a single sample measures the throttle, not the engine. Min over
    # interleaved passes is the standard throttle-resistant estimator
    # (every pass still includes planning + full execution). r10: three
    # passes (was two — the r9 round-over-round ambiguity was amplified by
    # best-of-2 on a throttled box), and the canary is timed BEFORE EVERY
    # PASS plus once after the last, so the line records the throttle's
    # within-session SPREAD, not one point estimate.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if runs < 1:
        raise SystemExit(f"SPARK_GRAFT_BENCH_RUNS must be >= 1, got {runs}")
    # Throttle canary: same fixed pipeline as the warmup, now timed.
    # Uniform VM slowdowns move this number with the suite; plan
    # regressions move only the suite.
    cal_times: list[float] = []

    def _timed_calibration() -> None:
        t0 = time.perf_counter()
        _calibration_pipeline()
        cal_times.append(round(time.perf_counter() - t0, 3))

    best: dict[str, float] = {}
    acc: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    pass_totals: list[float] = []
    for _ in range(runs):
        _timed_calibration()
        pass_total = 0.0
        for name in sorted(bench_specs):
            spec = bench_specs[name]
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, dt), dt)
            acc[name] = acc.get(name, 0.0) + dt
            samples.setdefault(name, []).append(dt)
            pass_total += dt
        pass_totals.append(round(pass_total, 3))
    _timed_calibration()  # closing sample: drift across the whole suite

    # Parallelism proof (r12 verdict ask): the r11 driver's 8-vs-32-core
    # ratios read ≈1 on every sub-3s query (overhead-bound at sf0.1) and
    # the scaling block flagged "suspect_cpus_ignored" — refutable only if
    # the artifact itself carries the effective core count and a probe
    # with enough work to split. Both JSON lines now carry the session's
    # effective parallelism; the FULL line adds a fixed-work CPU probe
    # (same sha2 pipeline at 1 partition vs defaultParallelism partitions,
    # untimed region, after the passes) whose ratio shows how much of the
    # advertised core count the engine actually engages.
    default_parallelism = spark.sparkContext.defaultParallelism
    eff_shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _cpu_probe(partitions: int) -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 12_000_000, 1, partitions)
            .select(
                (F.xxhash64(F.sha2(F.col("id").cast("string"), 256)) % 1_000_003).alias("h")
            )
            .groupBy()
            .agg(F.sum("h"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return round(time.perf_counter() - t0, 3)

    try:
        _cpu_probe(default_parallelism)  # JIT warm, untimed
        # min of 2 per leg: a single straggler task (hypervisor burst)
        # otherwise understates the ratio
        probe_parallel = min(_cpu_probe(default_parallelism) for _ in range(2))
        probe_serial = min(_cpu_probe(1) for _ in range(2))
    except Exception:  # noqa: BLE001 — the probe must never cost the headline
        probe_parallel = probe_serial = 0.0

    calibration_sec = round(min(cal_times), 3)
    mean = {n: round(s / runs, 3) for n, s in acc.items()}
    median = {
        n: round(statistics.median(v), 3) for n, v in samples.items()
    }
    total = round(sum(best.values()), 3)
    full = {
        "metric": "headline query suite wall time (per-query best of %d)" % runs,
        "value": total,
        "unit": "sec",
        "queries": best,
        # mean over the same interleaved passes — reported alongside
        # the min so round-over-round comparisons can use either
        # estimator (r1 was single-run ≈ mean; r3+ headline is min).
        "queries_mean": mean,
        "value_mean": round(sum(mean.values()), 3),
        # median over the interleaved passes — robust to a single
        # throttled pass in a way neither min nor mean is
        "queries_median": median,
        "value_median": round(sum(median.values()), 3),
        "runs": runs,
        # per-pass suite totals + per-pass canary samples (first `runs`
        # entries lead each pass; the last closes the session): the
        # within-session throttle spread the r9 ambiguity was missing
        "pass_totals": pass_totals,
        "calibration_runs": cal_times,
        "sf": sf,
        "calibration_sec": calibration_sec,
        "default_parallelism": default_parallelism,
        "shuffle_partitions": eff_shuffle_parts,
        # fixed CPU-bound work at 1 partition vs defaultParallelism
        # partitions — the in-artifact proof that the session engages its
        # cores (ratio ≈ cores on an unthrottled box; the per-query sf0.1
        # timings stay overhead-bound and CANNOT show this)
        "cpu_probe_serial_sec": probe_serial,
        "cpu_probe_parallel_sec": probe_parallel,
        "cpu_probe_speedup": round(probe_serial / max(probe_parallel, 1e-9), 2),
    }
    # Full per-query line first (may exceed the driver's 2000-char tail
    # window; preserved verbatim in _scale/bench_full_last.json) …
    print(json.dumps(full))
    try:
        os.makedirs("_scale", exist_ok=True)
        with open("_scale/bench_full_last.json", "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    # … then the compact headline line LAST so it always fits the tail
    # capture whatever the headline-set size (r7 lesson: never let the
    # final line grow unboundedly with the query count).
    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "value_mean": full["value_mean"],
        "value_median": full["value_median"],
        "runs": runs,
        "pass_totals": pass_totals,
        "calibration_runs": cal_times,
        "sf": sf,
        "calibration_sec": calibration_sec,
        "default_parallelism": default_parallelism,
        "shuffle_partitions": eff_shuffle_parts,
        "cpu_probe_speedup": round(probe_serial / max(probe_parallel, 1e-9), 2),
        "nqueries": len(best),
        "queries": best,
    }
    if len(json.dumps(compact)) > 1700:
        # Per-query dict no longer fits the driver's 2000-char tail window
        # alongside the headline fields — drop it from the final line (it
        # is on the full line above and in _scale/bench_full_last.json).
        compact["queries"] = {}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
