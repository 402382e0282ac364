"""Test-table catalog: load the driver-generated TPC-H-ish parquet tables
and register them as temp views so both the DataFrame builders and
``spark.sql`` queries can address them by name.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Some driver-generated events.parquet versions store ts as INT64
        # TIMESTAMP(NANOS), which the Spark parquet reader rejects outright.
        # Read nanos as long (runtime conf so it applies in any caller's
        # session) and truncate to microseconds — the same nanos→micros
        # truncation DuckDB applies, keeping the oracle comparison exact.
        # Newer data versions store plain micros, which Spark reads natively
        # as a timestamp — detect which case we got and convert only the
        # long-typed one.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            # integer DIV, not `/` — float division loses exactness at 1e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view named after itself; returns the
    DataFrames. Re-registration is cheap (metadata only) and idempotent."""
    # timestamp semantics (hour/date_trunc/year...) must match the UTC-naive
    # parquet data and the DuckDB oracle regardless of the caller's session
    # defaults — pin the session timezone here, where every query passes.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
