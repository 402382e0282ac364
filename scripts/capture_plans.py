#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [name,name,...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: the
bench=True headline set) built against $SPARK_GRAFT_SF_DIR (default sf0.1).
Explain only — nothing is executed, so this is safe to run alongside other
work; plans are the AQE initial plans (isFinalPlan=false), the same thing
`df.explain("formatted")` shows a user.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark

    registry = load_all()
    if len(sys.argv) > 3:
        names = [n for n in sys.argv[3].split(",") if n]
    else:
        names = sorted(n for n, s in registry.items() if s.bench)

    spark = get_spark(app_name=f"capture-plans-{tag}")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = registry[name]
        try:
            df = spec.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record the failure in the artifact
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
