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
# r6 window: (a) t36 + s17, registered after the r5 window froze at 50 —
# the only queries with no driver row at all; (b) the r6-new operators
# (u06 txlog ACID lifecycle, q81 Markov entropy, d18 MinHash estimator
# calibration, t38 hard-negative mining, b03 BPE held-out audit, f02
# OLS, r04 PRF expansion, x01 CUPED, x02 SRM, x03 MDE, r05 NDCG eval,
# d19 bloom FPR, m09 shot boundaries); (c) the 35 stalest greens —
# every query whose latest driver row is r2 (the q26–q65 relational
# block, q09/q10, t07/t08) — exactly 50 after q60/q61/q62/q63/q64
# (r2-green, unchanged, lowest-risk of the stale block — q61's funnel
# semantics are additionally re-proven via q79, green r5) yield their
# slots to the last five r6 ops; they lead the r7 window. r5's 50 rows were ALL
# green (CORRECTNESS_r05), so nothing needs a retest slot this round.
#
# Late-r6: eight more never-checked ops (s19 MIPS reduction, t41 Heaps,
# t42 Zipf, f03 Theil–Sen, x04 Neyman, u08 forget audit, r06 QL
# retrieval, m10 luminance stats) take the front; eight more r2-greens
# whose surfaces are re-proven by later green rows yield slots and join
# q60–q64 at the head of the r7 window: q34 (string surface ≈ t13/t14
# regexp family, green r5), q44 (datetime surface ≈ q77/q80/f03), q48
# (distribution windows ≈ q77), q49 (set ops ≈ q33 r3), q53 (month
# spine ≈ f01 backtest spine, green r5), q54 (interval range frame ≈
# q77's frame family), q65 (join/agg shape ≈ q05/q09), t07 (sampling ≈
# t24/t39). t08 KEEPS its slot: it was rewritten in r5 (the
# _with_tokens binding) after its last green row.
#
# Late-r6 batch 2 (x05 mSPRT, s20 JL audit, t43 budget selection, b04
# BPE vocab curve) displaces four more re-proven r2 greens to the r7
# head: q26 (event-time bucketing ≈ q77/q80, green r5; q26 also runs
# every bench), q38 (two-sided dim join ≈ q05/q09), q40 (top-k supplier
# ≈ q02/q10 TakeOrdered shape), q42 (filter+agg ≈ q03/q79). Batch 3
# (r07 RBO, t44 KL drift) displaces q10 (top-k ≈ q02/q03, q03 benches
# every round) and q32 (correlated subquery ≈ q36, which keeps its
# slot). Batch 4 (x07 DEFF, f04 seasonal strength) displaces q28
# (events JSON ≈ q56 variant, which stays, + the r5-green event apps)
# and q31 (percentiles ≈ the t30/q77 family, green r5).
#
# r6-session batch 5: twelve brand-new ops (v01–v04 privacy family, x06
# BH-FDR, x08 bootstrap, g03 BFS reach, f05 EWMA, u09 skew audit, t45
# padding curve, m11 header audit, q82 recursive CTE) have no driver
# row at all — never-checked queries outrank stale-but-once-green ones
# (the t36/s17 precedent). Twelve r2 greens yield slots and lead the r7
# window with the earlier displacements: q09 (benches every round —
# implicitly re-proven), q37 (sketch surface re-proven by q37r, green
# r5), q41 (null-aware anti ≈ q59, which KEEPS its slot), q45/q46/q51/
# q52/q55 (UDF/streaming surfaces re-proven continuously by pytest
# stream≡batch and property suites; q55's rewrite was r5-window-green),
# q56 (variant surface, green r2, unchanged), q57 (semi/anti
# composition ≈ q04/q07), q58 (map-agg, unchanged since r2 green), and
# q36 (green r2, unchanged; it was named as q32's keep-anchor, so q36
# AND q32 both lead the r7 window to restore that chain). q59 keeps its
# slot (anchors q41's displacement); t08 keeps its slot (rewritten in
# r5 after its last green).
#
# Registered after this window froze (the t36/s17 precedent — they MUST
# lead the r7 window as the only never-checked queries then): r08 index
# capacity stats, u10 compaction planner, v05 generalization ladder,
# q83 spatial neighbor join, f06 forecast reconciliation, u11 retention
# simulator, t46 dedup survivorship report, x09 A/A p-value calibration,
# s21 filtered-ANN recall curve, v06 t-closeness audit, p04 privacy
# -gated release pipeline, q84 join-cardinality estimation audit,
# m12 PNG CRC quarantine, q85 cumulative distinct users, t47 held-out
# n-gram novelty rate.
DRIVER_PRIORITY: list[str] = [
    # r6-session additions — never driver-checked
    "v01_k_anonymity_audit",
    "v02_l_diversity_entropy",
    "v03_qi_uniqueness_risk",
    "v04_dp_noisy_release",
    "x06_bh_fdr_screen",
    "x08_poisson_bootstrap_ci",
    "g03_supply_chain_reach",
    "f05_ewma_backtest",
    "u09_partition_skew_audit",
    "t45_batch_padding_efficiency",
    "m11_png_header_audit",
    "q82_recursive_part_closure",
    # late-r6 additions — never driver-checked
    "x07_cluster_randomization_deff",
    "f04_seasonal_strength",
    "r07_ranker_rank_biased_overlap",
    "t44_source_token_drift",
    "x05_msprt_sequential_test",
    "s20_jl_projection_distortion",
    "t43_token_budget_selection",
    "b04_bpe_vocab_size_curve",
    "s19_mips_norm_reduction_topk",
    "t41_heaps_vocab_growth",
    "t42_zipf_rank_frequency",
    "f03_theil_sen_trend",
    "x04_neyman_allocation",
    "u08_txlog_forget_audit",
    "r06_query_likelihood_topk",
    "m10_image_luminance_stats",
    # registered AFTER the r5 window froze at 50 — never driver-checked
    "t36_cluster_aware_split",
    "s17_ivf_nprobe_recall_curve",
    # brand-new in r6 (never driver-checked)
    "u06_txlog_merge_timetravel",
    "q81_markov_transition_entropy",
    "d18_minhash_estimator_calibration",
    "t38_hard_negative_mining",
    "b03_bpe_heldout_generalization",
    "f02_ols_price_on_quantity",
    "r04_prf_query_expansion",
    "x01_cuped_ab_lift",
    "x02_srm_check",
    "x03_experiment_power_mde",
    "r05_ranking_quality_eval",
    "d19_bloom_fpr_audit",
    "m09_video_shot_boundaries",
    "u07_txlog_incremental_rollup",
    "d20_dedup_threshold_sensitivity",
    "t39_weighted_reservoir_sample",
    "s18_cluster_label_purity",
    "t40_heldout_lm_perplexity",
    # the stale-green remainder (last driver row r2; see batch-5 note)
    "q59_null_semantics",
    "t08_repetition_score",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY reordered so DRIVER_PRIORITY entries come first."""
    reg = load_all()
    ordered = {name: reg[name] for name in DRIVER_PRIORITY if name in reg}
    ordered.update((name, spec) for name, spec in reg.items() if name not in ordered)
    return ordered
