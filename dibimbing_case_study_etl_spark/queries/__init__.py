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
        llm_ops18,
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
# r10 window: (a) the new registrations — st01 (the first
# registry-visible stateful-streaming query: applyInPandasWithState
# executed as a real two-micro-batch stream inside the callable, r9
# verdict ask #7), m15 (colour-JPEG decode through the new built-in
# 4:4:4 path, ask #6), u14 (compaction lifecycle through the txlog,
# previously pytest-only); (b) the
# r10-changed queries — the dedup-family consumers of this round's
# resource/validation fixes (bucket-cap env validation, the
# initial-labels/edges unpersist in dedup_clusters, the integral-id
# guard in both component algorithms): d03/d06/d07/g04 directly, p01/t36
# through the shared shingle→LSH→cluster subtree; (c) the 8 r4-latest
# holdovers named by the r9 verdict's ask — u02/u03/u04 (yielded slots to
# g04/u13/t49 in r9), s01 (bench set), d04/s03/s06/s07 (rows-only by
# design, r5-green oracled twins) — spending their slots directly so
# post-r10 NO query's latest driver row is older than r5; (d) 16 of the
# 50 r5-latest greens, oldest-first rotation (the remaining 34 — q76–q80, the
# r/s tail r01–r03/s02/s03r/s06r–s09r/s13–s16, the t20–t35 text block,
# and u05 — lead r11's stale block; the txlog re-checks took their
# slots).
DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked — registered this round
    "st01_stateful_stream_totals",
    "m15_jpeg_color_decode_stats",
    "u14_txlog_compaction",
    "st02_stream_session_windows",
    "t50_vocab_growth_heaps",
    "x10_sprt_ab_monitor",
    "u15_txlog_schema_evolution",
    "u16_txlog_clustered_compaction",
    "u17_txlog_deletion_vectors",
    "st03_stream_stream_attribution",
    "q86_mad_robust_outliers",
    "g05_degree_assortativity",
    # (b) changed this round (dedup-family resource/validation fixes;
    # m14's encoder internals were refactored for the colour path —
    # _encode_block/_dct_quantize extraction, byte-identical output)
    "m14_jpeg_decode_stats",
    "d03_dedup_minhash_lsh",
    "d06_dedup_clusters",
    "d07_dedup_resolution",
    "g04_connected_components",
    "p01_training_data_pipeline",
    "t36_cluster_aware_split",
    # (b2) the txlog family: the r10 schema-evolution fold changed the
    # commit payloads, the state fold, and every read path
    "u06_txlog_merge_timetravel",
    "u07_txlog_incremental_rollup",
    "u08_txlog_forget_audit",
    "u10_compaction_planner",
    "u11_retention_policy_simulator",
    "u12_layout_clustering_depth",
    "u13_txlog_object_store_roundtrip",
    # (c) the r4-latest holdover tail, retired in full
    "d04_dedup_simhash",
    "s01_ann_cosine_topk",
    "s03_ann_topk_blas",
    "s06_ann_ivf_topk",
    "s07_ann_pq_topk",
    "u02_scd2_dimension",
    "u03_snapshot_diff",
    "u04_cdc_apply",
    # (d) the r5-latest block, oldest-first rotation
    "b01_bpe_merges",
    "b02_bpe_token_stats",
    "d04r_simhash_md5_pairs",
    "d11r_semdedup_seeded_pairs",
    "d16_cross_source_contamination",
    "d17_quality_keeper_resolution",
    "f01_seasonal_naive_backtest",
    "g01_pagerank_knn_graph",
    "g02_neardup_triangle_census",
    "m01_multimodal_features",
    "m06_phash_neardup",
    "m08_png_phash_neardup",
    "p03_incremental_refresh_pipeline",
    "q37r_sketch_error_audit",
    "q74_attribution_models",
    "q75_position_attribution",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
