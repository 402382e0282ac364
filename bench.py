#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is materialized with the no-op sink (full computation, no
result serialization cost); timings exclude session startup but include
planning.
"""

from __future__ import annotations

import json
import os
import re
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

    # warm the session (JVM/codegen/FS metadata) outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in sorted(bench_specs):
        spec = bench_specs[name]
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
