"""CLI entry — parity with the reference's script harness
(`python scripts/extract_open_meteo_to_minio.py --config-file variables.json
--run-date 2025-10-16`, `README.md:230-241`): one command runs the full
medallion pipeline for a ``ds``.

    python -m dibimbing_case_study_etl_spark.cli \
        --config-file cfg.json --run-date 2025-10-16 [--payload-file p.json]

``--payload-file`` replaces the live HTTP fetch (offline/backfill path —
the reference's manual-trigger backfill, `README.md:195-199`).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dibimbing-etl-spark", description=__doc__)
    p.add_argument("--config-file", required=True, help="JSON config (storage + open_meteo)")
    p.add_argument(
        "--run-date",
        default=None,
        help="ds (YYYY-MM-DD); defaults to today like the reference (`extract:111`)",
    )
    p.add_argument("--payload-file", default=None, help="use a local JSON payload instead of HTTP")
    return p


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    ds = args.run_date or dt.date.today().isoformat()
    dt.date.fromisoformat(ds)  # fail fast on malformed dates

    from dibimbing_case_study_etl_spark.config import PipelineConfig
    from dibimbing_case_study_etl_spark.pipeline.weather import run_pipeline
    from dibimbing_case_study_etl_spark.session import get_spark

    cfg = PipelineConfig.from_file(args.config_file)
    payload = None
    if args.payload_file:
        with open(args.payload_file, encoding="utf-8") as f:
            payload = json.load(f)

    spark = get_spark(app_name=f"weather-etl-{ds}")
    artifacts = run_pipeline(spark, cfg, ds, payload=payload)
    print(json.dumps({"ds": ds, **artifacts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
