#!/usr/bin/env python
"""Merge partial scale-sweep outputs into one summary JSON.

The sweep is restartable by design: each run prints one JSON line per
query, so an interrupted leg leaves a reconstructable log. This tool
folds any mix of part files into the summary format `render_scale_md.py`
consumes:

- a full summary JSON (has a ``queries`` key) — e.g. a completed leg,
- a plain ``{name: record}`` dict JSON — e.g. a saved head slice,
- a JSONL of per-query ``{"q": name, ...}`` lines — e.g. grepped from an
  interrupted leg's log.

Later parts win on duplicate names (re-runs supersede). ``suite_sec`` is
the sum of recorded per-query Spark+oracle seconds (the parts ran in
separate sessions, so a single wall clock does not exist).

Usage: merge_sweep_parts.py out.json sf_dir part1 [part2 ...]
"""

from __future__ import annotations

import json
import sys


def load_part(path: str) -> dict[str, dict]:
    text = open(path).read().strip()
    if not text:
        return {}
    if text[0] == "{":
        try:
            d = json.loads(text)
        except ValueError:
            d = None
        if d is not None:
            if "queries" in d and isinstance(d["queries"], dict):
                return d["queries"]
            return d
    out: dict[str, dict] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        out[rec.pop("q")] = rec
    return out


def main() -> None:
    out_json, sf_dir, *parts = sys.argv[1:]
    results: dict[str, dict] = {}
    for p in parts:
        part = load_part(p)
        results.update(part)
        print(f"{p}: {len(part)} records", file=sys.stderr)
    results = dict(sorted(results.items()))
    summary = {
        "sf_dir": sf_dir,
        "suite_sec": round(
            sum(
                (r.get("spark_sec") or 0) + (r.get("oracle_sec") or 0)
                for r in results.values()
            ),
            1,
        ),
        "n_queries": len(results),
        "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "n_rows_only": sum(
            1 for r in results.values() if r["status"] == "ok_rows_only"
        ),
        "n_oracle_timeout": sum(
            1 for r in results.values() if r["status"] == "oracle_timeout"
        ),
        # see scale_sweep.py: oracle subprocess resource deaths are not
        # engine failures — the Spark side completed
        "n_oracle_error": sum(
            1 for r in results.values() if r["status"] == "oracle_error"
        ),
        "n_bad": sum(
            1
            for r in results.values()
            if r["status"] in ("mismatch", "spark_error")
        ),
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(
        f"{out_json}: {summary['n_queries']} queries, {summary['n_ok']} ok, "
        f"{summary['n_rows_only']} rows-only, {summary['n_oracle_timeout']} "
        f"oracle-timeout, {summary['n_bad']} bad",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
