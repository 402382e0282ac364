#!/usr/bin/env python
"""One LEG of the interleaved suite A/B between two repo trees (r9 verdict
ask #1: settle the r8-vs-r9 bench contradiction with same-session evidence).

Runs INSIDE whatever tree is the current working directory (invoke as
``python /abs/path/ab_bench_trees.py`` with ``cwd`` set to a git worktree of
the tree under test — the script itself lives outside both trees so both
legs execute byte-identical measurement code). Protocol mirrors bench.py:
canary-warmup + Python-worker warmup + per-query smoke pass at sf0.001,
then ONE timed pass over the bench set with the fixed-work canary timed
immediately before and after. One JSON line to stdout.

The orchestrating shell alternates cwd A/B/A/B/… in one session window, so
hypervisor-throttle drift hits both trees symmetrically and the per-leg
canaries record whatever drift remains.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.getcwd()
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    label = os.environ.get("AB_LABEL", os.path.basename(tree))
    only = os.environ.get("AB_ONLY")  # comma-separated subset (probe mode)

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    spark = get_spark(app_name=f"ab-{label}")
    registry = load_all()
    specs = {n: s for n, s in registry.items() if s.bench}
    if only:
        wanted = set(only.split(","))
        specs = {n: s for n, s in specs.items() if n in wanted}

    def _calibration_pipeline() -> None:
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
                F.sum(
                    F.call_function("rint", F.col("v") * 100).cast("bigint")
                ).alias("s"),
                F.avg("v").alias("a"),
                F.count(F.lit(1)).alias("c"),
            )
            .orderBy("s")
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    # warmup: JIT the canary pipeline, start Python workers, smoke-compile
    # every benched plan at sf0.001 (identical to bench.py's warm model)
    _calibration_pipeline()
    df = spark.range(200_000).select(
        "id", (F.col("id") % 97).alias("k"), (F.col("id") * 0.001).alias("v")
    )
    df.mapInPandas(lambda it: it, schema="id long, k long, v double").groupBy(
        "k"
    ).applyInPandas(
        lambda p: p.head(1), schema="id long, k long, v double"
    ).write.mode("overwrite").format("noop").save()
    smoke = os.path.join(
        os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata", "sf0.001"
    )
    if os.path.isdir(smoke):
        for name in sorted(specs):
            specs[name].build(spark, smoke).write.mode("overwrite").format(
                "noop"
            ).save()

    def _timed_cal() -> float:
        t0 = time.perf_counter()
        _calibration_pipeline()
        return round(time.perf_counter() - t0, 3)

    cal_pre = _timed_cal()
    queries: dict[str, float] = {}
    for name in sorted(specs):
        t0 = time.perf_counter()
        specs[name].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
        queries[name] = round(time.perf_counter() - t0, 3)
    cal_post = _timed_cal()

    print(
        json.dumps(
            {
                "label": label,
                "tree": tree,
                "sf_dir": sf_dir,
                "total": round(sum(queries.values()), 3),
                "cal_pre": cal_pre,
                "cal_post": cal_post,
                "queries": queries,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
