#!/usr/bin/env python
"""Scale sweep: run EVERY registry query at a larger scale factor (default
the replicated sf1 built by make_scale_data.py) and, where an oracle
exists, compare against DuckDB on the same data — the full correctness
gate, executed at 10x the driver's largest SF. Results feed SCALE.md.

Per query this records:
  * ``spark_sec``  — build + materialize (noop sink, no result transfer)
  * ``status``     — ok / mismatch / spark_error / oracle_error /
                     oracle_timeout (rows-only fallback)
  * ``spark_rows`` — result cardinality
  * ``oracle_sec`` — DuckDB wall time on identical parquet (single-node
                     comparison point), when the oracle ran

Oracles run in a worker subprocess with a hard timeout: a handful are
deliberately quadratic exact baselines (fine at driver SF, hopeless at
sf1 in a single-node engine) and must not wedge the sweep — the Spark
side still proves executability and row counts for those.

Usage: python scripts/scale_sweep.py [sf_dir] [out_json] [--no-oracle]
           [--only=prefix,prefix,...]

``--only`` restricts the sweep to queries whose name starts with one of
the given prefixes — e.g. ``--only=d,s,t,m,p01,u`` for the LLM-ops
family at sf4, where the relational TPC-H block adds nothing to the
scale question under test.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORACLE_TIMEOUT_S = int(os.environ.get("SCALE_ORACLE_TIMEOUT_S", "600"))


def _oracle_worker(sql: str, sf_dir: str, out_path: str, tmp_dir: str) -> None:
    from dibimbing_case_study_etl_spark.testing import duckdb_connection

    con = duckdb_connection(sf_dir)
    # spill into a per-run directory the PARENT owns and deletes: a killed
    # (timeout) or resource-dead subprocess cannot clean up after itself,
    # and DuckDB's default cwd-relative .tmp spill accumulated >60 GB of
    # orphans across killed quadratic oracles at sf4 — enough to ENOSPC
    # the Spark side of the NEXT query.
    con.execute(f"SET temp_directory='{tmp_dir}'")
    # cap the oracle's RAM: DuckDB's default limit is 80% of the BOX
    # (~100 GB here) — d08's quadratic oracle reached 106 GB RSS at sf4
    # and the kernel OOM killer took the Spark JVM's heartbeats down with
    # it. 24 GB forces the spill path (bounded above) instead.
    con.execute("SET memory_limit='24GB'")
    pdf = con.execute(sql).df()
    con.close()
    pdf.to_pickle(out_path)


def run_oracle_subprocess(sql: str, sf_dir: str, timeout_s: int):
    """Run the oracle in a killable subprocess; returns (pdf|None, status)."""
    import shutil
    import tempfile

    import pandas as pd

    out_path = f"/tmp/_sweep_oracle_{os.getpid()}_{time.monotonic_ns()}.pkl"
    tmp_dir = tempfile.mkdtemp(prefix="_sweep_duckdb_spill_")
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_oracle_worker, args=(sql, sf_dir, out_path, tmp_dir))
    p.start()
    p.join(timeout_s)
    try:
        if p.is_alive():
            p.terminate()
            p.join(10)
            if p.is_alive():  # stuck in native code: escalate to SIGKILL
                p.kill()
                p.join(10)
            return None, "oracle_timeout"
        if p.exitcode != 0:
            return None, "oracle_error"
        return pd.read_pickle(out_path), "ok"
    finally:
        if os.path.exists(out_path):
            os.unlink(out_path)
        shutil.rmtree(tmp_dir, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/_scale/sf1"
    out_json = args[1] if len(args) > 1 else "/root/repo/_scale/sweep_sf1.json"
    with_oracle = "--no-oracle" not in sys.argv
    only = [
        p
        for a in sys.argv[1:]
        if a.startswith("--only=")
        for p in a[len("--only=") :].split(",")
        if p
    ]

    from dibimbing_case_study_etl_spark.queries import load_all
    from dibimbing_case_study_etl_spark.session import get_spark
    from dibimbing_case_study_etl_spark.testing import compare_frames

    spark = get_spark(app_name="scale-sweep", shuffle_partitions=64)
    registry = load_all()

    results: dict[str, dict] = {}
    t_suite = time.perf_counter()
    for name in sorted(registry):
        if only and not any(name.startswith(p) for p in only):
            continue
        spec = registry[name]
        rec: dict = {"status": "ok", "spark_sec": None, "oracle_sec": None,
                     "spark_rows": None, "problems": None}
        t0 = time.perf_counter()
        try:
            df = spec.build(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            rec["spark_rows"] = df.count()
        except Exception as e:  # noqa: BLE001 — sweep must survive any query
            rec["status"] = "spark_error"
            rec["problems"] = f"{type(e).__name__}: {e}"[:500]
            results[name] = rec
            print(json.dumps({"q": name, **rec}), flush=True)
            continue

        if with_oracle and spec.oracle is not None:
            t1 = time.perf_counter()
            oracle_pdf, ostatus = run_oracle_subprocess(
                spec.oracle, sf_dir, ORACLE_TIMEOUT_S
            )
            rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
            if ostatus != "ok":
                rec["status"] = ostatus
            else:
                problems = compare_frames(df.toPandas(), oracle_pdf)
                if problems:
                    rec["status"] = "mismatch"
                    rec["problems"] = problems[:3]
        else:
            rec["status"] = "ok_rows_only"
        results[name] = rec
        print(json.dumps({"q": name, **rec}), flush=True)

    summary = {
        "sf_dir": sf_dir,
        "suite_sec": round(time.perf_counter() - t_suite, 1),
        "n_queries": len(results),
        "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "n_rows_only": sum(1 for r in results.values() if r["status"] == "ok_rows_only"),
        "n_oracle_timeout": sum(1 for r in results.values() if r["status"] == "oracle_timeout"),
        # oracle_error at sweep scale = the DuckDB subprocess died on
        # resources (observed: spill-to-disk exhaustion on the quadratic
        # s09r audit at sf1) — every oracle is value-green at sf0.001/0.01
        # in the same round, so a genuine SQL bug cannot reach here. Kept
        # out of n_bad: the ENGINE side completed; the single-node oracle
        # could not run.
        "n_oracle_error": sum(1 for r in results.values() if r["status"] == "oracle_error"),
        "n_bad": sum(
            1 for r in results.values()
            if r["status"] in ("mismatch", "spark_error")
        ),
        "queries": results,
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "queries"}))


if __name__ == "__main__":
    main()
