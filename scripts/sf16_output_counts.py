#!/usr/bin/env python
"""Output-count justification for the sf16 curve's steep rows: a slope
past ~linear is defensible only when the OUTPUT grows superlinearly with
it (the d03 precedent: 9.3x sf16/sf4 wall for 16.2x pairs). Counts the
emitted rows of the pair-producing scale paths at sf4 and sf16.

Usage: python scripts/sf16_output_counts.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["d08_edit_distance_pairs", "d03_dedup_minhash_lsh", "t36_cluster_aware_split"]
SFS = {"sf4": "/root/repo/_scale/sf4", "sf16": "/root/repo/_scale/sf16"}


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf16_output_counts.json"

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="sf16-output-counts", shuffle_partitions=128)
    out: dict[str, dict[str, int]] = {}
    for sf_label, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        out[sf_label] = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            n = registry[name].build(spark, sf_dir).count()
            out[sf_label][name] = n
            print(
                json.dumps(
                    {"sf": sf_label, "q": name, "rows": n,
                     "sec": round(time.perf_counter() - t0, 1)}
                ),
                flush=True,
            )
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()

    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
