"""merge_sweep_parts: the restartable-sweep merge must accept all three
part formats, let later parts supersede earlier ones, and classify
statuses the way render_scale_md.py reads them (resource-dead oracles are
not engine failures)."""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = "/root/repo/scripts/merge_sweep_parts.py"


def _rec(status: str, sec: float = 1.0) -> dict:
    return {
        "status": status,
        "spark_sec": sec,
        "oracle_sec": None,
        "spark_rows": 1,
        "problems": None,
    }


def test_merge_formats_and_supersede(tmp_path):
    full = tmp_path / "full.json"
    full.write_text(
        json.dumps({"sf_dir": "x", "queries": {"a": _rec("ok"), "b": _rec("spark_error")}})
    )
    plain = tmp_path / "plain.json"
    plain.write_text(json.dumps({"c": _rec("oracle_timeout")}))
    lines = tmp_path / "lines.jsonl"
    lines.write_text(
        json.dumps({"q": "b", **_rec("ok", 2.0)})  # supersedes the spark_error
        + "\n"
        + json.dumps({"q": "d", **_rec("oracle_error")})
        + "\n"
    )
    out = tmp_path / "out.json"
    subprocess.run(
        [sys.executable, SCRIPT, str(out), "sfdir", str(full), str(plain), str(lines)],
        check=True,
        capture_output=True,
    )
    merged = json.loads(out.read_text())
    assert merged["n_queries"] == 4
    assert merged["queries"]["b"]["status"] == "ok"  # later part won
    assert merged["queries"]["b"]["spark_sec"] == 2.0
    assert merged["n_ok"] == 2
    assert merged["n_oracle_timeout"] == 1
    # oracle resource deaths are counted on their own, NOT as failures —
    # the engine side completed (see scale_sweep.py)
    assert merged["n_oracle_error"] == 1
    assert merged["n_bad"] == 0
    assert merged["sf_dir"] == "sfdir"
