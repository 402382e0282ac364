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
        llm_ops3,
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
    # never driver-checked (r1+r2 windows never reached these 13)
    "q66_min_cost_supplier",
    "q67_lateral_topk_orders",
    "q68_session_window_native",
    "q69_sql_udf_discount",
    "q70_error_tolerant_parse",
    "d10_containment_pairs",
    "d11_semdedup_pairs",
    "s08_embedding_pca_whiten",
    "t09_source_data_card",
    "t10_unigram_surprisal",
    "t11_sequence_packing",
    "t12_mixture_weights",
    "u01_incremental_rollup",
    # new in r3 — first driver check
    "t13_pii_redaction",
    "t14_ngram_topk",
    "d12_dup_ngram_fraction",
    "d13_bloom_decontamination",
    "m06_phash_neardup",
    "t15_tokenize_ids",
    "s09_knn_graph",
    # fixed this round — need a fresh green row after the r2 red
    "q27_events_sessionize",  # TIMESTAMP_NTZ regression fixed in catalog.load_table
    "q29_asof_join",  # same NTZ fix
    "q43_array_agg",  # array cell → '|'-joined string (driver canonicalizer crash)
    # oracle/builder text changed this round (ROUND → rint/round_even
    # migration) — re-verify even though values should be identical
    "q14_promo_revenue_share",
    "q21_window_running_total",
    "q24_pivot_status_by_priority",
    "q30_range_join",
    "q33_grouping_sets",
    "q35_sql_cte_ntile",
    "q39_market_share",
    "q47_unpivot_stack",
    "q50_values_inline_dim",
    # backfill: longest-unverified r1 greens (not re-checked since round 1)
    "q01_pricing_summary",
    "q02_topk_orders",
    "q03_shipping_priority",
    "q04_priority_semi_join",
    "q05_region_nation_revenue",
    "q06_revenue_filter",
    "q07_customers_without_orders",
    "q11_group_having",
    "q13_order_count_distribution",
    "q15_set_ops",
    "q17_cube_status_priority",
    "q18_distinct_counts",
    "q19_theta_join_ranges",
    "q20_window_topn_per_group",
    "q23_dedup_latest_per_key",
    "d01_dedup_exact",
    "d02_dedup_jaccard_pairs",
    "d05_embedding_neardup_pairs",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
