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
        llm_ops19,
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
# r11 window: (a) the new registrations — u18 (deletion-vector
# retention lifecycle: delete → compact → vacuum with live-set
# invariance and physical sidecar/file counts, r10 verdict ask #6),
# m16 (4:2:0 chroma-subsampled JPEG decode through the generalized
# built-in MCU walk, ask #4), x11 (exact two-sample KS drift test on a
# distributed prefix-sum ECDF — no single-task global window), st04
# (arbitrary-state sessionization with EVENT-TIME TIMEOUTS — per-key
# timers flushing and removing open-session state, the state-lifecycle
# mechanics st01–st03 don't cover), st05 (dropDuplicatesWithinWatermark
# as a registry row: cross-batch key-state dedup + late-drop suppressing
# a full duplicate copy of the stream); (b) the r11-changed queries — the FULL
# txlog family again (the r11 ADVICE fixes changed commit payloads and
# the fold: dv_targets recording in delete_where, dv_removed emission
# in merge, per-retry schema re-validation in append, the 5-tuple
# _fold_state), plus m14/m15 whose shared decoder was generalized for
# subsampling (byte-identical on 4:4:4 input, but the MCU walk is new
# code); (c) the full 34-query r5-latest holdover tail named by the
# r10 verdict's ask #1 — spent directly, so post-r11 NO query's latest
# driver row is older than r6, zero exceptions.
DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked — registered this round
    "u18_txlog_dv_vacuum",
    "m16_jpeg_420_decode_stats",
    "x11_ks_drift_test",
    "st04_stream_timeout_sessions",
    "st05_stream_dedup_watermark",
    # (b) changed this round: txlog commit-payload/fold changes
    "u06_txlog_merge_timetravel",
    "u07_txlog_incremental_rollup",
    "u08_txlog_forget_audit",
    "u10_compaction_planner",
    "u11_retention_policy_simulator",
    "u12_layout_clustering_depth",
    "u13_txlog_object_store_roundtrip",
    "u14_txlog_compaction",
    "u15_txlog_schema_evolution",
    "u16_txlog_clustered_compaction",
    "u17_txlog_deletion_vectors",
    # (b2) m14/m15 (consumers of the generalized decoder, byte-identical
    # output, r10-green, re-verified oracle-green in BOTH committed r11
    # sweeps) sit at positions 51/52 — just outside the 50-window — so
    # all 34 holdovers and the 5 new registrations fit; they lead r12
    # (c) the full r5-latest holdover tail, retired in one window
    "q76_frequent_event_paths",
    "q77_rolling_zscore_anomaly",
    "q78_rfm_segmentation",
    "q79_funnel_conversion",
    "q80_activity_streaks",
    "r01_bm25_topk",
    "r02_item_cooccurrence_lift",
    "r03_rrf_hybrid_topk",
    "s02_ann_lsh_topk",
    "s03_ann_topk_blas",  # r11: twin contract folded in, newly oracled
    "s06r_ann_ivf_seeded_topk",
    "s07r_pq_code_histogram",
    "s08r_pca_whiten_audit",
    "s09r_knn_graph_rounded",
    "s13_kmeans_lloyd_audit",
    "s14_dim_truncation_recall",
    "s15_ivfpq_serving_recall",
    "s16_delta_index_merge",
    "t20_tokenizer_fertility",
    "t21_leakage_safe_split",
    "t22_epoch_shuffle",
    "t23_perplexity_filter",
    "t24_quality_weighted_sample",
    "t25_dedup_token_accounting",
    "t26_substring_dedup_spans",
    "t27_hashed_quality_classifier",
    "t28_span_corruption_plan",
    "t29_gopher_rules",
    "t30_source_length_winsorize",
    "t31_mixture_annealing_plan",
    "t32_classifier_calibration",
    "t33_chunk_dedup_reconstruct",
    "t35_prefix_cache_audit",
    "u05_bitemporal_asof",
    "m15_jpeg_color_decode_stats",
    "m14_jpeg_decode_stats",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
