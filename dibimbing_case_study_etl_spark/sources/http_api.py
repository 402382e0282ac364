"""HTTP API source — Open-Meteo forecast fetch with retry/backoff.

Spark has no native HTTP source, and this is one tiny JSON document per
ingest day, so the request stays driver-side plain Python — parity with
`scripts/extract_open_meteo_to_minio.py:51-85` (timeout, ``retries+1``
attempts, linear backoff) without inventing a distributed fetch that would
hammer the API from every executor.

``requests`` is import-gated: offline environments (like the test
container) use fixture payloads instead.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any


def build_params(cfg: dict[str, Any]) -> dict[str, str]:
    """Config → API query params; the ``hourly`` list joins by comma
    (parity: `extract:36-49`, F12 `extract:41`)."""
    return {
        "latitude": str(cfg["latitude"]),
        "longitude": str(cfg["longitude"]),
        "timezone": cfg.get("timezone", "UTC"),
        "hourly": ",".join(cfg.get("hourly", ["temperature_2m"])),
    }


def http_get_json(
    url: str,
    params: dict[str, str],
    timeout_sec: int = 30,
    retries: int = 3,
    backoff_sec: float = 2.0,
) -> dict[str, Any]:
    """GET JSON with ``retries+1`` attempts and linear backoff
    (parity: `extract:51-85`)."""
    full = f"{url}?{urllib.parse.urlencode(params)}"
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(full, timeout=timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, TimeoutError, ValueError) as exc:
            last = exc
            if attempt < retries:
                time.sleep(backoff_sec * (attempt + 1))
    raise RuntimeError(f"GET {url} failed after {retries + 1} attempts") from last


def fetch_open_meteo(cfg: dict[str, Any]) -> dict[str, Any]:
    return http_get_json(
        cfg["base_url"],
        build_params(cfg),
        timeout_sec=int(cfg.get("timeout_sec", 30)),
        retries=int(cfg.get("retries", 3)),
        backoff_sec=float(cfg.get("backoff_sec", 2.0)),
    )
