"""SparkSession factory.

Defaults are chosen for the 100 TB posture (SURVEY §4.2):

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion/promotion at runtime).
- Arrow on (every Pandas-UDF boundary is Arrow-batched, never per-row).
- Dynamic partition overwrite (the atomicity primitive behind
  ``merge_upsert`` over plain Parquet — only touched partitions rewrite).
- Session timezone pinned to UTC (Spark timestamps are session-TZ;
  the DuckDB oracle and the parquet test data are UTC-naive).
- Shuffle partitions sized to the local core count rather than the 200
  default; on a real cluster this is overridden per deployment (AQE
  coalescing makes the initial number less critical).

Local mode (``local[N]``) is the test substrate; nothing here assumes it —
``master`` is injectable and every operator in the package is written for
multi-executor partitioned execution (no driver-side collects in any
data path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "dibimbing-case-study-etl-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``driver_memory`` only takes effect if no JVM is running yet; in local
    mode the driver is the only process so it is the one memory knob.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
