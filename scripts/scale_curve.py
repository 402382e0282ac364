#!/usr/bin/env python
"""Three-point scaling curve: run the bench headline set (plus the
operators whose scale posture changed this round) at sf0.1 / sf1 / sf4
in ONE Spark session, so JVM/codegen warmup does not masquerade as a
scaling effect (this VM's hypervisor throttle makes cross-session
comparisons swing 2-10x — the r4 lesson, SCALE.md).

Each query runs twice per SF; the min is recorded (first run at a new SF
still pays parquet footer reads — that is data, not noise, but codegen
compile is shared across SFs by running sf0.1 first).

Usage: python scripts/scale_curve.py [out_json] [--queries=a,b,c]
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
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = args[0] if args else "/root/repo/_scale/curve.json"
    only = [
        p
        for a in sys.argv[1:]
        if a.startswith("--queries=")
        for p in a[len("--queries=") :].split(",")
        if p
    ]

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    registry = load_all()
    names = only or sorted(
        [n for n, s in registry.items() if s.bench]
        + ["d03_dedup_minhash_lsh", "d08_edit_distance_pairs", "d01_dedup_exact"]
    )
    names = sorted(set(n for n in names if n in registry))

    spark = get_spark(app_name="scale-curve", shuffle_partitions=64)
    curve: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        curve[sf_label] = {}
        for name in names:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                registry[name].build(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            curve[sf_label][name] = round(best, 2)
            print(json.dumps({"sf": sf_label, "q": name, "sec": curve[sf_label][name]}), flush=True)

    with open(out_json, "w") as f:
        json.dump(curve, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
