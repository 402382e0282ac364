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
        llm_ops2,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
    )

    return REGISTRY


# The correctness driver checks the registry in iteration order and may cap
# how many entries it verifies per round (round 1 covered exactly the first
# 50).  DRIVER_PRIORITY front-loads the queries that most need a green
# driver row THIS round: everything never yet driver-checked, then queries
# whose implementation or oracle changed since their last green row.
# Already-proven queries rotate to the back — they keep their pytest oracle
# coverage either way.  COVERAGE.md tracks which round checked what.
DRIVER_PRIORITY: list[str] = [
    # never driver-checked (round 1 window ended at entry 50)
    "q25_scalar_functions",
    "q26_events_hourly",
    "q27_events_sessionize",
    "q28_events_json_props",
    "q29_asof_join",
    "q30_range_join",
    "q31_percentiles",
    "q32_correlated_avg_subquery",
    "q33_grouping_sets",
    "q34_string_functions",
    "q35_sql_cte_ntile",
    "q36_scalar_subquery_anti",
    "q37_approx_aggregates",
    "q38_two_nation_volume",
    "q39_market_share",
    "q40_top_supplier",
    "q41_not_in_null_aware",
    "q42_large_orders",
    "q43_array_agg",
    "q44_datetime_functions",
    "q45_pandas_udf_scalar",
    "q46_grouped_pandas_udf",
    "q47_unpivot_stack",
    "q48_distribution_windows",
    "q49_multiset_ops",
    "q50_values_inline_dim",
    "q51_python_udtf_sentences",
    "q52_stateful_running_totals",
    "q53_recursive_month_spine",
    "q54_window_interval_range_frame",
    "q55_cogrouped_order_reconciliation",
    "q56_variant_semistructured",
    "q57_sole_blame_suppliers",
    "q58_map_type_aggregation",
    "q59_null_semantics",
    "q60_first_last_ignore_nulls",
    "q61_sequential_funnel",
    # changed this round — need a fresh green row
    "p01_training_data_pipeline",  # oracle SUM cast fixed (r1 hash fail)
    "s05_embedding_normalize",  # output exploded to scalars (r1 harness crash)
    "d03_dedup_minhash_lsh",  # candidate-gen vectorized
    "q09_nation_year_profit",  # broadcast hints removed
    "q10_returned_revenue_topk",  # broadcast hints removed
    "s04_embedding_dim_stats",  # mean migrated to rint/round_even helpers
    # new this round — first driver check
    "q62_important_part_values",
    "q63_supplier_diversity",
    "q64_heavy_widget_suppliers",
    "q65_nation_revenue_share",
    "d09_decontamination",
    "t07_stratified_sample",
    "t08_repetition_score",
    # s08_embedding_pca_whiten is new but no_oracle (rows-only check) —
    # it sits just past the 50-entry window and rotates in next round.
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
