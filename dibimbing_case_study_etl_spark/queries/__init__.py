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
        llm_ops4,
        llm_ops5,
        llm_ops6,
        llm_ops7,
        llm_ops8,
        llm_ops9,
        llm_ops10,
        llm_ops11,
        llm_ops12,
        llm_ops13,
        llm_ops14,
        llm_ops15,
        llm_ops16,
        llm_ops17,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
    )

    return REGISTRY


# The correctness driver checks the registry in iteration order and may cap
# how many entries it verifies per round (round 1 covered exactly the first
# 50).  DRIVER_PRIORITY front-loads the queries that most need a green
# driver row THIS round: everything never yet driver-checked, then queries
# whose implementation or oracle changed since their last green row.
# Already-proven queries rotate to the back — they keep their pytest oracle
# coverage either way.  COVERAGE.md tracks which round checked what.
#
# r8 window: all 50 r7 rows were hash-green and r7 left ZERO
# never-checked queries, so this window is almost pure staleness
# rotation — the r7 verdict's ask #3 ("post-r8 no green older than r4").
# One new registration (m14, the JPEG codec query) and one changed
# kernel (d03) take the front; the remaining 48 slots drain the entire
# r2-latest block (11) and 37 of the 45 r3-latest (the per-entry
# comment below explains the 8 holdovers).
DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked — registered this round
    "m14_jpeg_decode_stats",
    # (b) changed this round: d03's LSH kernel (prefix-sig emission,
    # strip-chunked bucket-pair enumeration, bucket_cap seam). The pair
    # set is proven unchanged by the strip-invariance pytest and a full
    # sf0.01 registry-vs-oracle sweep, but the driver row is the gate.
    # Its composite consumers (p01/t36/t46/d14/...) were all re-verified
    # by the same sweep and keep their newer green rows.
    "d03_dedup_minhash_lsh",
    # (c) the staleness rotation, oldest first (COVERAGE.md two-round
    # rule): all 11 r2-latest greens, then 37 of the 45 r3-latest. The 8
    # r3 holdovers for r9 — d01/d13/q01/q03/q23/q27 (bench set and/or
    # sf16 scale path, local-oracle-green every round) and s08/s09
    # (rows-only by design; their oracled audit twins s08r/s09r carry
    # newer hash-green rows) — have the strongest continuous secondary
    # evidence.
    "q10_returned_revenue_topk",
    "q26_events_hourly",
    "q37_approx_aggregates",
    "q57_sole_blame_suppliers",
    "q58_map_type_aggregation",
    "q60_first_last_ignore_nulls",
    "q61_sequential_funnel",
    "q62_important_part_values",
    "q63_supplier_diversity",
    "q64_heavy_widget_suppliers",
    "q65_nation_revenue_share",
    "d11_semdedup_pairs",
    "q02_topk_orders",
    "q04_priority_semi_join",
    "q05_region_nation_revenue",
    "q06_revenue_filter",
    "q07_customers_without_orders",
    "q11_group_having",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_set_ops",
    "q17_cube_status_priority",
    "q18_distinct_counts",
    "q19_theta_join_ranges",
    "q20_window_topn_per_group",
    "q21_window_running_total",
    "q24_pivot_status_by_priority",
    "q29_asof_join",
    "q30_range_join",
    "q33_grouping_sets",
    "q35_sql_cte_ntile",
    "q39_market_share",
    "q43_array_agg",
    "q47_unpivot_stack",
    "q50_values_inline_dim",
    "q66_min_cost_supplier",
    "q67_lateral_topk_orders",
    "q68_session_window_native",
    "q69_sql_udf_discount",
    "q70_error_tolerant_parse",
    "t09_source_data_card",
    "t10_unigram_surprisal",
    "t11_sequence_packing",
    "t12_mixture_weights",
    "t13_pii_redaction",
    "t14_ngram_topk",
    "t15_tokenize_ids",
    "u01_incremental_rollup",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
