"""Local mirror of the driver's correctness gate.

Runs a query's Spark builder and its DuckDB oracle SQL on the same parquet
tables and compares row count, column-name set, and (order-insensitively)
the values — the same three checks CORRECTNESS_r{N}.json records — so every
registry entry is validated at sf0.001 in pytest before the driver ever
sees it at sf0.01.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from dibimbing_case_study_etl_spark.catalog import TABLES, table_path

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the test tables registered as views,
    matching the driver's pre-registered view names."""
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # multi-file table layout (e.g. the _scale/ sweep data):
            # DuckDB needs an explicit glob where Spark takes the directory
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v: Any) -> Any:
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return _canon_cell(v.item())
    return v


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]

    def sort_key(row: tuple) -> tuple:
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    return sorted(rows, key=sort_key)


def _cells_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, int) or isinstance(a, int) and isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL)
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, max_report: int = 5) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = _canon_frame(spark_pdf), _canon_frame(oracle_pdf)
    n_bad = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not _cells_equal(sr, orow):
            n_bad += 1
            if n_bad <= max_report:
                problems.append(f"row {i} differs:\n  spark : {sr}\n  oracle: {orow}")
    if n_bad > max_report:
        problems.append(f"... {n_bad} rows differ in total")
    return problems
