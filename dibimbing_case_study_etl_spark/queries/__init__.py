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
# r4 window: the 12 never-driver-checked r4 queries (t16-t18, d14, d15,
# s10, s11, u02, u03, q71, q72, m07, m08) and the r4-changed ones (d05/s01
# cosine clamp, d12 single-scan, m06 16-band, t10/t17/d14 single-explode,
# d11 clone-canonicalization) first, then the queries whose latest green
# is still r1, then the stalest r2 greens — front-loading the _spread
# consumers (d03, p01, s04/s05) whose partition sizing changed this round.
DRIVER_PRIORITY: list[str] = [
    # new in r4 — never driver-checked
    "t16_document_chunking",
    "t17_tfidf_top_terms",
    "d14_incremental_dedup",
    "s10_embedding_quantize_int8",
    "u02_scd2_dimension",
    "u03_snapshot_diff",
    "q71_cohort_retention",
    "t18_bigram_surprisal",
    "q72_revenue_pareto",
    "d05_embedding_neardup_pairs",  # r4-changed: cosine clamped to [-1,1]
    "s01_ann_cosine_topk",  # r4-changed: same clamp
    "m07_png_decode_features",
    "m08_png_phash_neardup",
    "s11_cosine_histogram",
    "d15_cdc_span_pairs",
    "t19_langid_confusion",
    "u04_cdc_apply",
    "s12_embedding_drift",
    "t20_tokenizer_fertility",
    "q73_integrity_audit",
    "d12_dup_ngram_fraction",
    "m06_phash_neardup",
    "d04_dedup_simhash",
    "d06_dedup_clusters",
    "d07_dedup_resolution",
    "d08_edit_distance_pairs",
    "m01_multimodal_features",
    "m02_image_resize_pipeline",
    "m03_video_frame_sample",
    "m04_audio_resample",
    "m05_features_map_in_arrow",
    "q12_shipmode_case_when",
    "q16_rollup_region_nation",
    "q22_window_lag_lead",
    "s02_ann_lsh_topk",
    "s03_ann_topk_blas",
    "s06_ann_ivf_topk",
    "s07_ann_pq_topk",
    "t01_lang_id",
    "t02_quality_score",
    "t03_token_stats",
    "t04_fingerprint",
    "t05_hash_split",
    "t06_vocab_topk",
    "d03_dedup_minhash_lsh",
    "d09_decontamination",
    "p01_training_data_pipeline",
    "s04_embedding_dim_stats",
    "s05_embedding_normalize",
    "q25_scalar_functions",
    "q26_events_hourly",
    "q28_events_json_props",
    "q31_percentiles",
    "q32_correlated_avg_subquery",
    "q34_string_functions",
    "q36_scalar_subquery_anti",
    "q37_approx_aggregates",
    "q38_two_nation_volume",
    "q40_top_supplier",
    "q41_not_in_null_aware",
    "q42_large_orders",
    "q44_datetime_functions",
    "q45_pandas_udf_scalar",
    "q46_grouped_pandas_udf",
    "q48_distribution_windows",
    "q49_multiset_ops",
    "q51_python_udtf_sentences",
    "q52_stateful_running_totals",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
