"""DST-edge golden fixture (SURVEY §7 divergence note, r2 verdict item 7).

Pins the engine's semantics for local-time rows that fall in a DST
transition, where the reference's pandas normalize
(`scripts/normalize_open_meteo_to_parquet.py:63`,
``tz_localize(nonexistent="shift_forward", ambiguous="NaT")``) and Spark's
``to_utc_timestamp`` (java.time ZoneId resolution) can differ:

* **Nonexistent local times** (spring-forward gap, e.g. America/New_York
  2025-03-09 02:00): java.time applies the pre-transition offset, which
  lands on the SAME UTC instant as pandas' shift_forward (shift local +1h,
  then apply the post-transition offset) — no divergence. Consequence:
  the gap hour collides with the following local hour on the UTC PK
  (02:00 EST ≡ 03:00 EDT ≡ 07:00 UTC), and the L1/L2 upsert's
  last-in-batch-order-wins arbitration keeps exactly one row.
* **Ambiguous local times** (fall-back repeat, e.g. 2025-11-02 01:00):
  java.time resolves to the FIRST occurrence (earlier offset, EDT);
  pandas with ambiguous="NaT" drops the row. The engine deliberately
  keeps the row — a training-data pipeline should not silently shed an
  hour of data once a year — and the second occurrence's UTC slot is
  simply never produced from local input.
"""

from __future__ import annotations

import datetime as dt

import pytest

from dibimbing_case_study_etl_spark.config import PipelineConfig, StorageConfig
from dibimbing_case_study_etl_spark.pipeline.weather import read_l2, run_pipeline


@pytest.fixture()
def cfg(tmp_path):
    return PipelineConfig(storage=StorageConfig(base_dir=str(tmp_path)))


def _l2_ts(spark, cfg, ds, times):
    doc = {
        "hourly": {
            "time": times,
            "temperature_2m": [10.0 + i for i in range(len(times))],
        },
        "latitude": 40.7,
        "longitude": -74.0,
        "timezone": "America/New_York",
    }
    run_pipeline(spark, cfg, ds=ds, payload=doc)
    rows = read_l2(spark, cfg).orderBy("ts").collect()
    return rows


@pytest.mark.slow
def test_spring_forward_gap_shifts_and_collides(spark, cfg):
    # 2025-03-09 02:00 America/New_York does not exist (EST->EDT jump).
    times = [f"2025-03-09T0{h}:00" for h in range(5)]  # 00..04 local
    rows = _l2_ts(spark, cfg, "2025-03-09", times)
    got = [r.ts for r in rows]
    # 00:00,01:00 are EST (UTC-5); 02:00 resolves like shift_forward to the
    # same instant as 03:00 EDT (UTC-4) -> PK collision -> one row survives;
    # 04:00 EDT follows.  Net: 4 distinct UTC instants for 5 local inputs.
    assert got == [
        dt.datetime(2025, 3, 9, 5, 0),
        dt.datetime(2025, 3, 9, 6, 0),
        dt.datetime(2025, 3, 9, 7, 0),
        dt.datetime(2025, 3, 9, 8, 0),
    ]
    # last-in-batch-order wins the collision: the surviving 07:00 row is the
    # local 03:00 reading (temp 13.0), not the gap row's 12.0 — the same
    # arbitration the reference applies to in-batch PK dupes (`load:140-147`).
    t7 = [r.temperature_c for r in rows if r.ts == dt.datetime(2025, 3, 9, 7, 0)]
    assert t7 == [13.0]


def test_fall_back_ambiguous_keeps_first_occurrence(spark, cfg):
    # 2025-11-02 01:00 America/New_York happens twice (EDT->EST).
    times = [f"2025-11-02T0{h}:00" for h in range(4)]  # 00..03 local
    rows = _l2_ts(spark, cfg, "2025-11-02", times)
    got = [r.ts for r in rows]
    # 01:00 resolves to the FIRST occurrence (EDT, 05:00 UTC). The second
    # occurrence's slot (06:00 UTC) is never produced from local input.
    # pandas ambiguous="NaT" would have dropped the 01:00 row entirely —
    # documented divergence: the engine keeps it.
    assert got == [
        dt.datetime(2025, 11, 2, 4, 0),
        dt.datetime(2025, 11, 2, 5, 0),
        dt.datetime(2025, 11, 2, 7, 0),
        dt.datetime(2025, 11, 2, 8, 0),
    ]
    assert dt.datetime(2025, 11, 2, 6, 0) not in got


def test_normal_day_unaffected(spark, cfg):
    # control: a no-transition day maps 1:1 with a constant EDT offset.
    times = [f"2025-06-01T0{h}:00" for h in range(3)]
    rows = _l2_ts(spark, cfg, "2025-06-01", times)
    assert [r.ts for r in rows] == [
        dt.datetime(2025, 6, 1, 4, 0),
        dt.datetime(2025, 6, 1, 5, 0),
        dt.datetime(2025, 6, 1, 6, 0),
    ]
    # date/hour stay the *local* calendar values (pandas parity)
    assert {r.date for r in rows} == {dt.date(2025, 6, 1)}
    assert [r.hour for r in rows] == [0, 1, 2]
