"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``dibimbing_case_study_etl_spark.queries.REGISTRY``: every
implemented operator from SURVEY.md §2 registers one Spark DataFrame builder
plus (where SQL-expressible) a DuckDB oracle SQL string there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dibimbing_case_study_etl_spark.queries import load_all, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries that most need a driver correctness row this round
    come first (see ``queries.DRIVER_PRIORITY`` / COVERAGE.md) — the driver
    may verify only a prefix of the registry per round.
    """
    return {name: spec.build for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in ordered_registry().items() if spec.oracle is not None
    }
