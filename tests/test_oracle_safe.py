"""Cross-engine determinism of the oracle_safe rounding helpers — the
contract every money/ratio oracle in the registry rests on: Spark ``rint``
and DuckDB ``round_even`` must agree on EVERY binary double, including the
exact .5 scaled boundaries and their nextafter neighbours, and the scaled
integer sum must be partitioning-independent."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    dsum,
    iround,
    sql_dsum,
    sql_iround,
)


def _boundary_values() -> np.ndarray:
    ms = np.arange(-500, 500)
    # x*100 lands as close to m+0.5 as a double can get — the values where
    # HALF_UP vs round-even vs shortest-repr BigDecimal rounding all differ
    base = (ms + 0.5) / 100.0
    rng = np.random.default_rng(3)
    return np.concatenate(
        [
            base,
            np.nextafter(base, np.inf),
            np.nextafter(base, -np.inf),
            rng.uniform(-1e6, 1e6, 2000),
            np.array([0.0, -0.005, 0.005, 36197.505, 1964425.435]),
        ]
    )


def test_iround_bit_identical_to_duckdb_round_even(spark):
    vals = _boundary_values()
    pdf = pd.DataFrame({"i": np.arange(len(vals)), "v": vals})
    got = (
        spark.createDataFrame(pdf)
        .select("i", iround(F.col("v"), 2).alias("r"))
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT i, {sql_iround('v', 2)} AS r FROM t ORDER BY i").df()
    con.close()
    np.testing.assert_array_equal(got["r"].to_numpy(), want["r"].to_numpy())


def test_dsum_partitioning_independent_and_matches_duckdb(spark):
    vals = _boundary_values()
    pdf = pd.DataFrame({"v": vals})
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT {sql_dsum('v', 2)} AS s FROM t").df()["s"][0]
    con.close()
    for nparts in (1, 7, 32):
        got = (
            spark.createDataFrame(pdf)
            .repartition(nparts)
            .agg(dsum(F.col("v"), 2).alias("s"))
            .collect()[0]
            .s
        )
        assert got == want, (nparts, got, want)
