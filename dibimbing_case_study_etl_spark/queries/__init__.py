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
# r9 window: (a) the new registrations (g04 pointer-jump connected
# components; u13 object-store-hosted commit log; t49 term burstiness); (b) the r9-changed
# queries — m14's fixture geometry
# actually varies the block-row count now (r8 ADVICE: the old
# (d*3)%3 height term was identically 0) with the oracle updated in the
# same commit, and the six txlog-backed queries (u06–u08, u10–u12)
# whose table's LOG read path moved behind the injectable CommitStore
# seam (list_names/read) this round; (c) the 8 r3-latest holdovers the
# r8 verdict's ask #2 names — d01/d13/q01/q03/q23/q27 plus rows-only
# s08/s09, spending their slots directly so post-r9 NO query's latest
# driver row is older than r4, zero exceptions; (d) 32 of the 40
# r4-latest greens. The 8 r4 holdovers for r10: d04/s03/s06/s07
# (rows-only by design, r5-green oracled twins d04r/s03r/s06r/s07r),
# s01 (bench set, re-measured + local-oracle-green every round), and
# u02/u03/u04 (yielded their slots to the new g04/u13/t49; r4-green,
# local-oracle-green every round).
DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked — registered this round
    "g04_connected_components",
    "u13_txlog_object_store_roundtrip",
    "t49_term_burstiness",
    # (b) changed this round
    "m14_jpeg_decode_stats",
    "u06_txlog_merge_timetravel",
    "u07_txlog_incremental_rollup",
    "u08_txlog_forget_audit",
    "u10_compaction_planner",
    "u11_retention_policy_simulator",
    "u12_layout_clustering_depth",
    # (c) the r3-latest staleness tail, retired in full
    "d01_dedup_exact",
    "d13_bloom_decontamination",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q23_dedup_latest_per_key",
    "q27_events_sessionize",
    "s08_embedding_pca_whiten",
    "s09_knn_graph",
    # (d) the r4-latest block, oldest-first rotation
    "d05_embedding_neardup_pairs",
    "d06_dedup_clusters",
    "d07_dedup_resolution",
    "d09_decontamination",
    "d12_dup_ngram_fraction",
    "d14_incremental_dedup",
    "d15_cdc_span_pairs",
    "m05_features_map_in_arrow",
    "m07_png_decode_features",
    "p01_training_data_pipeline",
    "q12_shipmode_case_when",
    "q16_rollup_region_nation",
    "q22_window_lag_lead",
    "q25_scalar_functions",
    "q71_cohort_retention",
    "q72_revenue_pareto",
    "q73_integrity_audit",
    "s04_embedding_dim_stats",
    "s05_embedding_normalize",
    "s10_embedding_quantize_int8",
    "s11_cosine_histogram",
    "s12_embedding_drift",
    "t01_lang_id",
    "t02_quality_score",
    "t03_token_stats",
    "t04_fingerprint",
    "t05_hash_split",
    "t06_vocab_topk",
    "t16_document_chunking",
    "t17_tfidf_top_terms",
    "t18_bigram_surprisal",
    "t19_langid_confusion",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
