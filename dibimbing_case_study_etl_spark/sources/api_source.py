"""Custom Python DataSource (Spark 4 DataSource API) for the Open-Meteo
feed: ``spark.read.format("open_meteo")`` with one input partition per
ingest day.

This upgrades SURVEY §2.1 S1 (`scripts/extract_open_meteo_to_minio.py:51-85`)
from a driver-side fetch to a first-class source: the day range is split
into partitions, each executor task fetches/loads its own day, and the
rows land directly in the raw schema (plus the ``ds`` partition column) —
no driver buffering, which is the posture a multi-year backfill at scale
needs. A single-day read degenerates to one task, matching the
reference's one-request-per-day behavior (no API hammering).

Two modes, chosen by options:
- ``path``: offline/replay — reads ``{path}/source=open-meteo/ds={ds}/
  payload.json`` fixture layout (the pipeline's own raw landing zone).
- ``base_url`` (+ lat/lon/timezone): live HTTP via
  :func:`sources.http_api.http_get_json` with its retry/backoff policy,
  executed on the task, not the driver.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

RAW_WITH_DS_DDL = (
    "ds string, latitude double, longitude double, timezone string, "
    "hourly struct<time: array<string>, temperature_2m: array<double>>"
)


def _ds_range(start_ds: str, end_ds: str) -> list[str]:
    d0 = dt.date.fromisoformat(start_ds)
    d1 = dt.date.fromisoformat(end_ds)
    return [(d0 + dt.timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)]


class _DayPartition(InputPartition):
    def __init__(self, ds: str):
        self.ds = ds


class OpenMeteoReader(DataSourceReader):
    def __init__(self, schema, options):
        self.options = dict(options)
        start = self.options.get("start_ds") or self.options.get("ds")
        end = self.options.get("end_ds") or start
        if not start:
            raise ValueError("open_meteo source requires option 'ds' or 'start_ds'")
        self.days = _ds_range(start, end)

    def partitions(self) -> Sequence[InputPartition]:
        return [_DayPartition(ds) for ds in self.days]

    def read(self, partition: _DayPartition) -> Iterator[tuple]:
        ds = partition.ds
        path = self.options.get("path")
        if path:
            fp = os.path.join(path, "source=open-meteo", f"ds={ds}", "payload.json")
            with open(fp, encoding="utf-8") as f:
                doc = json.load(f)
        else:
            from dibimbing_case_study_etl_spark.sources.http_api import (
                build_params,
                http_get_json,
            )

            cfg = {
                "latitude": float(self.options.get("latitude", 0.0)),
                "longitude": float(self.options.get("longitude", 0.0)),
                "timezone": self.options.get("timezone", "UTC"),
                "hourly": self.options.get("hourly", "temperature_2m").split(","),
            }
            doc = http_get_json(
                self.options["base_url"],
                build_params(cfg),
                timeout_sec=int(self.options.get("timeout_sec", 30)),
                retries=int(self.options.get("retries", 3)),
                backoff_sec=float(self.options.get("backoff_sec", 2.0)),
            )
        hourly = doc.get("hourly", {})
        yield (
            ds,
            doc.get("latitude"),
            doc.get("longitude"),
            doc.get("timezone"),
            (hourly.get("time", []), hourly.get("temperature_2m", [])),
        )


class OpenMeteoWriter(DataSourceWriter):
    """Writer half of the connector: lands each row back into the raw
    ``source=open-meteo/ds={ds}/payload.json`` layout, executed task-side
    (one commit message per task, no driver buffering). Round-trips with
    the reader, so replay/repair jobs can rewrite a landing zone through
    the same format."""

    def __init__(self, options):
        self.path = dict(options)["path"]

    def write(self, iterator) -> WriterCommitMessage:
        written = 0
        for row in iterator:
            doc = {
                "latitude": row.latitude,
                "longitude": row.longitude,
                "timezone": row.timezone,
                "hourly": {
                    "time": list(row.hourly.time or []),
                    "temperature_2m": list(row.hourly.temperature_2m or []),
                },
            }
            leaf = os.path.join(self.path, "source=open-meteo", f"ds={row.ds}")
            os.makedirs(leaf, exist_ok=True)
            with open(os.path.join(leaf, "payload.json"), "w", encoding="utf-8") as f:
                json.dump(doc, f)
            written += 1
        return WriterCommitMessage()


class OpenMeteoDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "open_meteo"

    def schema(self) -> str:
        return RAW_WITH_DS_DDL

    def reader(self, schema) -> OpenMeteoReader:
        return OpenMeteoReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> OpenMeteoWriter:
        return OpenMeteoWriter(self.options)


def register_open_meteo_source(spark) -> None:
    """Idempotent registration; afterwards
    ``spark.read.format("open_meteo").options(...)`` works anywhere in the
    session."""
    spark.dataSource.register(OpenMeteoDataSource)
