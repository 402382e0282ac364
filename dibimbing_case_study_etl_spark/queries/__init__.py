"""Query registry.

Every implemented operator from SURVEY.md §2 (plus the north-star
LLM-data-pipeline operators) registers here as a :class:`QuerySpec` —
a Spark DataFrame builder paired with the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Conventions (driver contract):
- every computed column is aliased identically in the Spark builder and
  the oracle SQL (the driver's compare sorts columns by name);
- floating-point aggregates are rounded (money → 2 dp, ratios/sims → 4 dp)
  on BOTH sides so accumulation-order differences between engines cannot
  flip the value hash;
- results must be deterministic: every LIMIT/top-k has a total tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags, bench=bench
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so their registrations run; return REGISTRY."""
    from dibimbing_case_study_etl_spark.queries import (  # noqa: F401
        llm_ops,
        relational,
        relational2,
        relational3,
        relational4,
    )

    return REGISTRY
