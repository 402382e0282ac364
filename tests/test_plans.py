"""Physical-plan audits: the optimizations the 100 TB posture depends on
must actually appear in the plans — filter/projection pushdown into the
parquet scan, broadcast joins for dims, window-group-limit for top-N,
whole-stage codegen coverage."""

from __future__ import annotations

from dibimbing_case_study_etl_spark.queries import load_all

REGISTRY = load_all()


def explain_str(spark, sf_dir, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the scan must not read join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q05_broadcasts_dimensions(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q05_region_nation_revenue")
    assert "BroadcastHashJoin" in plan


def test_q09_q10_aqe_broadcasts_unhinted_dims(spark, sf_dir):
    """q09/q10 carry no broadcast hint on their SF-proportional sides
    (part, supplier⋈nation, customer⋈nation) — a forced hint would OOM
    executors at cluster scale. At bench SF those sides are small, so AQE
    must still pick broadcast at runtime from observed sizes: the hint is
    gone from the code, not from the executed plan."""
    for name in ("q09_nation_year_profit", "q10_returned_revenue_topk"):
        df = REGISTRY[name].build(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, name


def test_q06_pushes_all_predicates(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q06_revenue_filter")
    assert "PushedFilters" in plan and "l_discount" in plan and "l_quantity" in plan


def test_q20_uses_window_group_limit(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q20_window_topn_per_group")
    assert "WindowGroupLimit" in plan


def test_q02_topk_avoids_global_sort(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q02_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_present(spark, sf_dir):
    import contextlib
    import io

    df = REGISTRY["q01_pricing_summary"].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_d03_candidates_have_no_self_join(spark, sf_dir):
    """MinHash LSH candidate generation must be the bucket-pass shape
    (single grouped aggregation over banded signatures), not a shuffled
    self-join of the banded table; the only joins in the plan belong to
    the candidate-restricted exact verification."""
    plan = explain_str(spark, sf_dir, "d03_dedup_minhash_lsh")
    assert "SortMergeJoin" not in plan


def test_s06_ivf_broadcasts_probe_side(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "s06_ann_ivf_topk")
    assert "BroadcastHashJoin" in plan


def test_q53_spine_join_is_broadcast(spark, sf_dir):
    """The 84-row recursive spine must broadcast against the monthly
    aggregate, never shuffle the fact side for it."""
    plan = explain_str(spark, sf_dir, "q53_recursive_month_spine")
    assert "BroadcastHashJoin" in plan


def test_partitioned_layout_prunes_at_scan(spark, sf_dir, tmp_path):
    """Hive-partitioned layout turns a date predicate into partition
    pruning: the scan's PartitionFilters carries the predicate and only the
    matching directory is read — the mechanism that makes a 100 TB
    date-partitioned table answer single-day queries in O(day), not
    O(table)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.catalog import load_table

    path = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    events.write.mode("overwrite").partitionBy("date").parquet(path)

    one_day = spark.read.parquet(path).filter(F.col("date") == "2024-01-03")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-03" in plan.split("PartitionFilters")[1].splitlines()[0]
    # the pruned read must agree with the unpartitioned filter
    expect = events.filter(F.col("date") == "2024-01-03").count()
    assert one_day.count() == expect and expect > 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Joining a date-partitioned fact to a filtered dimension plants a
    dynamic-pruning subquery in the fact scan's PartitionFilters: at run
    time only partitions matching the dim filter's dates are read — the
    join-driven analogue of static pruning, essential when the predicate
    arrives via a dimension instead of a literal."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.catalog import load_table

    path = str(tmp_path / "events_dpp")
    events = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    events.write.mode("overwrite").partitionBy("date").parquet(path)
    fact = spark.read.parquet(path)

    dim = events.select("date").distinct().withColumn(
        "is_audit_day", F.dayofmonth("date") == 3
    )
    joined = fact.join(
        F.broadcast(dim.filter("is_audit_day")), "date"
    ).groupBy("date").count()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan or "dynamicpruningexpression" in plan.lower()

    expect = events.filter(F.dayofmonth("date") == 3).groupBy("date").count()
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))


def test_t06_partial_agg_before_shuffle_and_topk(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "t06_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_q55_cogroup_plan_shape(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "q55_cogrouped_order_reconciliation")
    assert "FlatMapCoGroupsInPandas" in plan


def test_q66_topk_and_no_sf_proportional_hints(spark, sf_dir):
    """Q2 shape: final top-100 must run as TakeOrderedAndProject (no global
    sort), fixed-size dims (nation/region) broadcast, and the plan text
    must not carry a hint-forced broadcast of the SF-proportional part
    table scan — part joins via whatever AQE picks at runtime."""
    plan = explain_str(spark, sf_dir, "q66_min_cost_supplier")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # nation/region dims


def test_q67_lateral_compiles_to_window_group_limit(spark, sf_dir):
    """The correlated LATERAL ORDER BY+LIMIT must compile to
    WindowGroupLimit (partial map-side prune to ≤3 rows per customer
    before the shuffle), not a per-row re-execution or a global sort."""
    plan = explain_str(spark, sf_dir, "q67_lateral_topk_orders")
    assert "WindowGroupLimit" in plan
    assert plan.count("Partial") >= 1


def test_t10_freq_join_unhinted(spark, sf_dir):
    """t10's word→frequency join side (the vocabulary) is sublinear but
    still data-proportional — it must carry no forced broadcast hint in
    the optimized plan; AQE decides at runtime (broadcast at bench SF)."""
    df = REGISTRY["t10_unigram_surprisal"].build(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    import re
    # the only allowed hint is the single-row total; count hint nodes
    assert optimized.lower().count("broadcast") <= 1


def test_runtime_bloom_filter_injected_on_selective_fact_join(spark, sf_dir):
    """100 TB posture: when the filtered dim side is too big to broadcast
    (the cluster-scale case — forced here by disabling broadcast), Spark
    must inject a runtime BLOOM FILTER on the fact scan so most fact rows
    drop BEFORE the join shuffle. Thresholds are tuned down because the
    test data is tiny; at real scale the defaults fire on their own."""
    from pyspark.sql import functions as F

    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt and "might_contain" in opt
    finally:
        for k, v in keep.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_t14_topk_avoids_global_sort_and_combines_map_side(spark, sf_dir):
    """Corpus n-gram top-k must be TakeOrderedAndProject (k rows per
    partition reach the driver, never a global sort) over a two-phase
    count (partial_count before the gram shuffle crushes the volume)."""
    plan = explain_str(spark, sf_dir, "t14_ngram_topk")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_d12_skew_safe_shape(spark, sf_dir):
    """The dup-shingle fraction must be the single-scan skew-safe shape:
    the corpus is tokenized+exploded exactly once (materialized via
    localCheckpoint — the final plan reads the checkpoint, never the
    parquet), document frequency via partial-agg groupBy (never a window —
    AQE cannot split a skewed WINDOW partition, and boilerplate shingles
    guarantee hot keys at scale), and a sort-merge/shuffle join whose flag
    side is unique-per-key so AQE skew-split applies."""
    plan = explain_str(spark, sf_dir, "d12_dup_ngram_fraction")
    assert "Window" not in plan
    assert "partial_count" in plan
    # single materialized pair set: the r3 two-explode shape re-scanned the
    # corpus (ReuseExchange can't fire across the partial-agg asymmetry);
    # the final plan must contain NO parquet scan and NO explode at all —
    # both consumers read the checkpointed pairs.
    assert "Scan parquet" not in plan
    assert "Generate explode" not in plan


def test_t13_is_pure_map_stage(spark, sf_dir):
    """PII scrubbing is stateless per-row regex: no exchange of any kind
    in the plan, one codegen stage over the scan."""
    plan = explain_str(spark, sf_dir, "t13_pii_redaction")
    assert "Exchange" not in plan
    assert "WholeStageCodegen" in plan or "Project" in plan


def test_t15_rank_window_is_bounded_and_encode_broadcasts(spark, sf_dir):
    """Tokenization must keep the global rank window on the BOUNDED model
    table (TakeOrderedAndProject reduces the corpus to vocab size before
    the window) and encode via a broadcast join — never a corpus-sized
    shuffle on the term key."""
    plan = explain_str(spark, sf_dir, "t15_tokenize_ids")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # exactly ONE hash shuffle (the vocab partial-count); the encode path
    # itself must not shuffle the exploded corpus
    assert plan.count("hashpartitioning") == 1


def test_m06_band_join_never_cross_joins(spark, sf_dir):
    """Perceptual-hash near-dup candidates must come from the banded
    equi-join (join keys include band/val), never a cartesian product of
    the signature table."""
    plan = explain_str(spark, sf_dir, "m06_phash_neardup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_d13_bloom_prefilter_runs_before_the_join(spark, sf_dir):
    """The bloom membership probe must be a Python map stage feeding the
    exact verification join — MapInPandas appears on the train side of
    the final join, so non-candidate rows die before any shuffle of the
    train-side shingles toward the join."""
    plan = explain_str(spark, sf_dir, "d13_bloom_decontamination")
    assert "MapInPandas" in plan


def test_s09_blocks_pack_in_python_and_topk_is_windowed(spark, sf_dir):
    """The k-NN graph must pack blocks via grouped pandas (one matrix per
    block), score block pairs in MapInPandas, and take the global top-k
    with a per-vector window — no corpus-sized broadcast anywhere."""
    plan = explain_str(spark, sf_dir, "s09_knn_graph")
    assert "FlatMapGroupsInPandas" in plan
    assert "MapInPandas" in plan
    assert "Window" in plan


def test_spread_partition_count_is_data_proportional(spark):
    """_spread must floor at the session's core count for small inputs
    (fan tiny tables across every core) but grow with catalyst's size
    estimate — a fixed cores-count partitioning would pack arbitrarily
    large data into arbitrarily large partitions at scale."""
    from pyspark.sql import functions as F

    from dibimbing_case_study_etl_spark.operators.dedup import (
        _SPREAD_MAX_PARTS,
        _spread_partitions,
    )

    cores = spark.sparkContext.defaultParallelism
    small = spark.range(100).select(F.col("id").alias("k"))
    assert _spread_partitions(small) == cores
    # ~4e9 rows by catalyst's estimate (plan-time stats — never executed)
    # → tens of GB → the proportional branch must win over the cores floor
    big = spark.range(1_000_000).crossJoin(
        spark.range(4096).select(F.col("id").alias("j"))
    ).select(F.col("id").alias("k"))
    n = _spread_partitions(big)
    assert cores < n <= _SPREAD_MAX_PARTS
    # Arrow-backed createDataFrame produces a LogicalRDD with NO stats:
    # catalyst reports the defaultSizeInBytes sentinel (Long.MaxValue),
    # which must read as "unknown" → cores floor, not as "8 EiB" → the
    # 200k-partition cap (regression: r4 wedged the suite exactly here).
    local = spark.createDataFrame(
        [(i, [0.1] * 8) for i in range(200)], "k long, v array<double>"
    )
    assert _spread_partitions(local) == cores


def test_t16_chunking_is_pure_map_stage(spark, sf_dir):
    """t16 is sequence→filter→explode→slice per row: no Exchange anywhere —
    chunking 100 TB must be scan-bound, never shuffle-bound."""
    plan = explain_str(spark, sf_dir, "t16_document_chunking")
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_t17_tfidf_single_explode_and_bounded_window(spark, sf_dir):
    """t17 explodes the corpus exactly once: the (doc, word) counts are
    materialized via localCheckpoint, so the downstream plan (df
    aggregate + joins + top-k) contains NO Generate node at all — both
    aggregates read the one materialized explode. The per-doc top-k is a
    WindowGroupLimit, not a full sort of all scored terms."""
    import re

    plan = explain_str(spark, sf_dir, "t17_tfidf_top_terms")
    assert len(re.findall(r"Generate \(\d+\)", plan)) == 0  # explode ran once, at the checkpoint
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan  # the materialized tf
    assert "WindowGroupLimit" in plan


def test_s10_quantization_is_pure_map_stage(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "s10_embedding_quantize_int8")
    assert "Exchange" not in plan


def test_u03_snapshot_diff_is_one_aggregation(spark, sf_dir):
    """Both snapshot states come from ONE conditional max_by aggregation:
    a single scan, a single Exchange, no window and no join — the naive
    scan×2 → window×2 → full-outer-join shape costs 3 shuffles of the
    event feed and must not reappear."""
    import re

    plan = explain_str(spark, sf_dir, "u03_snapshot_diff")
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1
    assert "Join" not in plan and "Window" not in plan
    # struct-keyed max_by plans as ObjectHashAggregate — still partial+final
    assert plan.count("Aggregate") >= 2


def test_u02_scd2_single_exchange_two_windows(spark, sf_dir):
    """The lag-collapse and the lead-validity windows share the same
    (o_custkey) partitioning and (od, o_orderkey) ordering: one Exchange,
    and no second sort for the second window."""
    import re

    plan = explain_str(spark, sf_dir, "u02_scd2_dimension")
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1
    assert len(re.findall(r"Sort \(\d+\)", plan)) == 1


def test_multi_consumer_ngram_queries_explode_once(spark, sf_dir):
    """Queries whose model/index table has MULTIPLE consumers must not
    re-explode the corpus per consumer (ReuseExchange cannot dedupe
    consumers with different exchange children — the d12 lesson). The
    materialization collapses the final plan to ≤1 Generate node."""
    import re

    for name, max_gen in (
        ("t17_tfidf_top_terms", 0),
        ("t18_bigram_surprisal", 1),
        ("t10_unigram_surprisal", 1),
        # d09 keeps the fused 4-explode shape deliberately: checkpointing
        # its exploded pairs demoted downstream joins off the broadcast
        # path and regressed 25x (see llm_ops2.d09 note); d13 is the
        # scale path for that family
        ("d14_incremental_dedup", 0),
    ):
        plan = explain_str(spark, sf_dir, name)
        n = len(re.findall(r"Generate \(\d+\)", plan))
        assert n <= max_gen, f"{name}: {n} Generate nodes (max {max_gen})"


def test_u04_cdc_apply_is_one_aggregation(spark, sf_dir):
    """u04 folds base + change feed + tombstones in ONE conditional
    max_by aggregation — single scan, single Exchange, no window/join."""
    import re

    plan = explain_str(spark, sf_dir, "u04_cdc_apply")
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_d08_blocking_is_banded_and_dp_is_thresholded(spark, sf_dir):
    """d08's r5 execution contract: the candidate join keys on the
    length-band alongside the prefix (the |Δlen| gate prunes BEFORE the
    join), and every Levenshtein in the plan is the threshold-banded
    three-argument form — O(len·k) diagonal band, never the full O(len²)
    DP."""
    import re

    plan = explain_str(spark, sf_dir, "d08_edit_distance_pairs")
    assert "__lband" in plan  # band key reached the join
    assert "levenshtein" in plan
    assert not re.search(r"levenshtein\([^,)]+, [^,)]+\)", plan), (
        "two-argument (unbanded) levenshtein found — the full-DP path is back"
    )


def test_d03_verify_runs_in_codegen_not_python(spark, sf_dir):
    """d03's r5 verification contract: candidate verification is JVM
    array_intersect (whole-stage codegen) — the per-pair Python verify
    kernel is gone, and no row-at-a-time Python remains anywhere. (The
    banding MapInPandas stays: formatted explain re-prints cached
    subtrees per consumer, so its occurrence count is not assertable.)"""
    plan = explain_str(spark, sf_dir, "d03_dedup_minhash_lsh")
    assert "array_intersect" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    # the verify join attaches shingle ARRAYS, not texts, so the old
    # Python-verify projection of raw text into the pair join is gone
    assert "__text_a" not in plan and "__text_b" not in plan


def test_t26_explodes_once_and_windows_only_by_doc(spark, sf_dir):
    """t26's execution contract: the positional n-gram explode runs exactly
    once (at the localCheckpoint — downstream consumers read the
    materialized occurrence set, so no Generate survives in the plan), the
    keeper is decided by an aggregate min(struct), and every window in the
    plan partitions by doc_id (document-bounded interval merge). A window
    partitioned by GRAM — the oracle's single-node formulation — would put
    the hottest boilerplate gram's every occurrence in one task."""
    import re

    plan = explain_str(spark, sf_dir, "t26_substring_dedup_spans")
    assert len(re.findall(r"Generate \(\d+\)", plan)) == 0
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    for spec in re.findall(r"windowspecdefinition\((\w+)", plan):
        assert spec == "doc_id", f"window partitioned by {spec}, not doc_id"


def test_r01_bm25_broadcasts_stats_and_takes_ordered_topk(spark, sf_dir):
    """r01's execution contract: document frequency and corpus stats are
    BROADCAST back to the term-frequency side (no shuffle of the corpus on
    tok), and the global top-k compiles to TakeOrderedAndProject — k rows
    per partition, never a full sort. Everything stays JVM-side."""
    plan = explain_str(spark, sf_dir, "r01_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_t27_classifier_is_one_exchange_no_python(spark, sf_dir):
    """t27's execution contract: the hash IS the weight lookup — no vocab
    join, no Python; the whole classifier is explode → map-side integer
    partial-agg → ONE doc-keyed exchange."""
    plan = explain_str(spark, sf_dir, "t27_hashed_quality_classifier")
    assert plan.count("Exchange (") == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_g01_final_plan_reads_checkpoints_not_parquet(spark, sf_dir):
    """g01's execution contract: fixpoint iteration truncates lineage —
    the returned plan reads the checkpointed rank table and the
    checkpointed edge set, never re-deriving the GEMM or re-scanning the
    corpus (no parquet scan may appear; without per-iteration truncation
    the plan deepens linearly and replans quadratically)."""
    plan = explain_str(spark, sf_dir, "g01_pagerank_knn_graph")
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    assert "Scan parquet" not in plan


def test_q74_attribution_has_no_touch_join(spark, sf_dir):
    """q74's execution contract: attribution is carried along the per-user
    event stream by IGNORE-NULLS bookend windows — the purchase⋈touch
    range join of the naive formulation (touches × purchases blowup on
    active users) must not exist anywhere in the plan."""
    plan = explain_str(spark, sf_dir, "q74_attribution_models")
    assert "Join" not in plan
    assert "windowspecdefinition(user_id" in plan


def test_u05_bitemporal_is_one_aggregation(spark, sf_dir):
    """u05's execution contract (the u03/u04 shape): both temporal
    reconstructions — as-known-at-T0 and as-known-now — come out of ONE
    partial-aggregable groupBy over the version feed. One exchange, no
    window, no self-join; the valid-time cut pushes to the scan."""
    plan = explain_str(spark, sf_dir, "u05_bitemporal_asof")
    assert plan.count("Exchange (") == 1
    assert "Window" not in plan and "Join" not in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_t28_mask_is_jvm_and_windows_by_doc(spark, sf_dir):
    """t28's execution contract: the noise mask is pure JVM codegen (hash
    arithmetic, no Python anywhere), and the span merge — like t26's —
    only ever windows by doc_id."""
    import re

    plan = explain_str(spark, sf_dir, "t28_span_corruption_plan")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    for spec in re.findall(r"windowspecdefinition\((\w+)", plan):
        assert spec == "doc_id", f"window partitioned by {spec}, not doc_id"


def test_t29_rules_are_map_flags_into_one_agg(spark, sf_dir):
    """t29's execution contract: the rule flags are pure map-stage
    expressions (no Python, no join); the only exchange is the
    |sources|-keyed aggregate."""
    plan = explain_str(spark, sf_dir, "t29_gopher_rules")
    assert plan.count("Exchange (") == 1
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_r02_broadcasts_totals_and_takes_ordered_topk(spark, sf_dir):
    """r02's execution contract: item totals and the user count broadcast
    back to the surviving pairs (no shuffle of the pair table on item),
    and the lift ranking compiles to TakeOrderedAndProject."""
    plan = explain_str(spark, sf_dir, "r02_item_cooccurrence_lift")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_f01_lags_over_the_aggregated_table(spark, sf_dir):
    """f01's execution contract: the event feed reduces to (type, day)
    totals BEFORE the seasonal-lag window — partial aggregation must
    appear below the window, and the window partitions by event_type."""
    plan = explain_str(spark, sf_dir, "f01_seasonal_naive_backtest")
    assert "windowspecdefinition(event_type" in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial + final
    assert "Join" not in plan


def test_q75_position_attribution_has_no_touch_join(spark, sf_dir):
    """q75's execution contract: like q74, the U-shaped credit split is
    carried along the per-user event stream — no purchase⋈touch join."""
    plan = explain_str(spark, sf_dir, "q75_position_attribution")
    assert "Join" not in plan
    assert "windowspecdefinition(user_id" in plan


def test_s15_models_broadcast_and_no_python(spark, sf_dir):
    """s15's execution contract: centroids, codebooks, and query vectors
    ride broadcasts (model-sized), the corpus-side encode/score stays in
    JVM codegen (no Python anywhere in the audit path)."""
    plan = explain_str(spark, sf_dir, "s15_ivfpq_serving_recall")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_q77_windows_are_day_bucketed_with_broadcast_halo(spark, sf_dir):
    """The scoring window must partition by (event_type, bucket) — never
    bare event_type, whose per-type single sort task is the unsplittable
    skew at 100 TB. The halo-day assignment table (types×days) must
    broadcast onto the tail rows, and the day report keeps its map-side
    partial."""
    plan = explain_str(spark, sf_dir, "q77_rolling_zscore_anomaly")
    # every event_type-keyed exchange must carry a second (day) key
    import re

    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    keys = [k for k in exchanges if "event_type" in k]
    assert keys, "expected event_type-keyed exchanges"
    # the scoring window must carry the composite (event_type, bucket) key
    assert any("bucket#" in k for k in keys), keys
    # bare event_type exchanges may exist ONLY for the types×days census
    # (its per-type running total + the halo-day self-join) — tiny tables;
    # the corpus-sized tail-rank and scoring windows are both composite
    bare = [k for k in keys if k.count("#") < 2]
    assert len(bare) <= 2, f"unexpected bare event_type exchanges: {bare}"
    assert "BroadcastHashJoin" in plan  # halo-day table broadcasts
    assert plan.count("HashAggregate") >= 2  # partial + final day report


def test_t30_broadcasts_cut_table(spark, sf_dir):
    """The per-source P5/P95 cut table (~|sources| rows) must broadcast
    back onto the corpus scan, never shuffle it."""
    plan = explain_str(spark, sf_dir, "t30_source_length_winsorize")
    assert "BroadcastHashJoin" in plan


def test_r03_broadcasts_model_side_tables(spark, sf_dir):
    """Corpus stats, the query-term table, and the cf table are model-sized
    and must broadcast; the ranked-list fusion join is bounded and must not
    trigger a cartesian product."""
    plan = explain_str(spark, sf_dir, "r03_rrf_hybrid_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_g02_triangle_join_is_equi_keyed(spark, sf_dir):
    """Wedge enumeration and the closing-edge check must run as equi-joins
    on the oriented edge keys (degree-ordered node iterator) — a cartesian
    or nested-loop pair scan would be quadratic in edges."""
    plan = explain_str(spark, sf_dir, "g02_neardup_triangle_census")
    assert "CartesianProduct" not in plan
    # the only nested-loops allowed are the two single-row summary
    # crossJoins (formatted explain prints each node in the tree AND the
    # detail section, so count tree lines only)
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 2
    # the LSH pair pipeline must be checkpointed, not inlined per consumer
    assert "Scan parquet" not in plan


def test_q78_windows_run_on_aggregated_user_table(spark, sf_dir):
    """The three NTILE windows must consume the per-user aggregate, not raw
    purchases: exactly one scan of events feeding one user-keyed partial
    agg before any window."""
    plan = explain_str(spark, sf_dir, "q78_rfm_segmentation")
    assert plan.count("Scan parquet") <= 2  # events + broadcast anchor scan
    assert plan.count("HashAggregate") >= 2


def test_t31_single_corpus_pass(spark, sf_dir):
    """The annealing plan derives everything from ONE source-keyed agg of
    the corpus; epochs and totals join in as broadcasts."""
    plan = explain_str(spark, sf_dir, "t31_mixture_annealing_plan")
    # the corpus scan lives INSIDE the checkpointed per-source agg, so the
    # downstream plan must show no parquet scan at all — both consumers
    # (totals + plan rows) read the checkpoint
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan  # tiny epoch/total crossJoins


def test_q79_no_cartesian_and_no_per_user_window(spark, sf_dir):
    """The funnel must run as user-keyed joins + aggregates: no window over
    raw events (the funnel anti-pattern) and no cartesian; the only
    nested-loop joins are the two single-row stage-metric crossJoins."""
    plan = explain_str(spark, sf_dir, "q79_funnel_conversion")
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 2


def test_q80_distinct_is_partial_aggregable(spark, sf_dir):
    """The DISTINCT (user, day) stage must partial-aggregate map-side
    before the shuffle; the island window partitions by user."""
    plan = explain_str(spark, sf_dir, "q80_activity_streaks")
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_t33_checkpoints_occurrences_once(spark, sf_dir):
    """Both consumers (keeper aggregate + join-back) must read the
    checkpointed occurrence set — an inlined lineage would tokenize and
    explode the corpus twice."""
    plan = explain_str(spark, sf_dir, "t33_chunk_dedup_reconstruct")
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_t35_topk_never_global_sorts(spark, sf_dir):
    """Top-20 prefixes must run as TakeOrderedAndProject over the partial
    aggregate — never a global Sort of the group table."""
    plan = explain_str(spark, sf_dir, "t35_prefix_cache_audit")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_s16_broadcasts_centroids_all_jvm(spark, sf_dir):
    """Centroids must broadcast against the corpus scan, the argmax must
    be an aggregate (partial rows fold map-side), and no Python ever runs
    in the loop."""
    plan = explain_str(spark, sf_dir, "s16_delta_index_merge")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_t36_checkpoints_pairs_and_assignment(spark, sf_dir):
    """The LSH pair set and the per-doc split assignment each feed
    multiple consumers — both must be checkpointed (an inlined lineage
    would replay LSH banding / label propagation per consumer), and no
    join may degrade to a cartesian."""
    plan = explain_str(spark, sf_dir, "t36_cluster_aware_split")
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_s17_one_corpus_assignment_all_jvm(spark, sf_dir):
    """All four nprobe settings must derive from one corpus cell
    assignment: broadcast centroids, an aggregate argmax (no corpus-wide
    per-vector window beyond the bounded query/exact sides), and zero
    Python in the loop."""
    plan = explain_str(spark, sf_dir, "s17_ivf_nprobe_recall_curve")
    assert "BroadcastNestedLoopJoin" in plan  # centroid / query-vector broadcasts
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan


def test_d18_band_join_is_equi_not_nested_loop(spark, sf_dir):
    """The 8-band OR-condition formulation would plan as a nested loop
    over |docs|²; the shipped shape explodes bands and equi-joins on the
    (band, v1, v2) struct. Pin the absence of the quadratic operators."""
    plan = explain_str(spark, sf_dir, "d18_minhash_estimator_calibration")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_t38_broadcasts_bounded_query_side(spark, sf_dir):
    """t38's label-mismatch theta join is INTENTIONALLY a broadcast
    nested loop — the query side is bounded (20 rows) and the corpus is
    never shuffled. Pin that the corpus side carries no Exchange into
    the join."""
    plan = explain_str(spark, sf_dir, "t38_hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan


def test_t39_sample_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = explain_str(spark, sf_dir, "t39_weighted_reservoir_sample")
    assert "TakeOrderedAndProject" in plan


def test_s19_reduction_broadcasts_and_ranks_with_group_limit(spark, sf_dir):
    """The MIPS reduction must broadcast the 10-vector query side against
    the corpus scan (theta join → broadcast nested loop, t38's shape) and
    the per-query top-k must push rank≤k down (WindowGroupLimit), never a
    global sort."""
    plan = explain_str(spark, sf_dir, "s19_mips_norm_reduction_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


def test_t41_no_corpus_window(spark, sf_dir):
    """Global gram positions must come from the distributed prefix sum —
    a Window operator anywhere in this plan would mean a single-partition
    ORDER BY over the corpus."""
    plan = explain_str(spark, sf_dir, "t41_heaps_vocab_growth")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_t43_no_corpus_window(spark, sf_dir):
    """The budget fill orders the corpus by quality — via prefix sum, not
    a global window."""
    plan = explain_str(spark, sf_dir, "t43_token_budget_selection")
    assert "Window" not in plan


def test_d20_single_pass_histograms(spark, sf_dir):
    """The rewritten sensitivity table bins pairs once into 5-row
    histograms; suffix sums replace the per-threshold explode and the
    (threshold, doc) count-distinct. Explain re-prints lazy-checkpoint
    lineage per consumer (plan-trap 11), so pin content, not node
    counts: no expand/distinct aggregate over (threshold, doc) and no
    cartesian."""
    plan = explain_str(spark, sf_dir, "d20_dedup_threshold_sensitivity")
    assert "CartesianProduct" not in plan
    assert "count(distinct" not in plan.lower()


def test_r07_rankers_take_ordered(spark, sf_dir):
    """The 50-row terms table is checkpointed (LogicalRDD), so the final
    plan's corpus-shielding boundary is an ExistingRDD scan — the ranker
    top-k limits live behind it (r01's own TakeOrderedAndProject shape
    is pinned by its docstring-audited plan; here we pin that nothing
    downstream of the rankers degrades to a cartesian over data-sized
    inputs — the only nested loop allowed is the ≤50-row depth×rbo
    broadcast)."""
    plan = explain_str(spark, sf_dir, "r07_ranker_rank_biased_overlap")
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_t44_broadcasts_top_vocab(spark, sf_dir):
    """Per-source counts must join the top-vocab by broadcast so only
    top-vocab occurrences shuffle; the shared corpus explode is
    checkpointed once."""
    plan = explain_str(spark, sf_dir, "t44_source_token_drift")
    assert "BroadcastHashJoin" in plan
    assert "ExistingRDD" in plan


def test_m10_real_decode_is_arrow_batched(spark, sf_dir):
    """Render and decode both run as Arrow-batched mapInPandas stages;
    the entropy arithmetic stays JVM-side (no Python past the counts)."""
    plan = explain_str(spark, sf_dir, "m10_image_luminance_stats")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_v03_grouping_sets_single_scan(spark, sf_dir):
    """All seven QI subsets must come from ONE customer scan through a
    single Expand node — seven separate group-bys would be seven scans."""
    plan = explain_str(spark, sf_dir, "v03_qi_uniqueness_risk")
    assert "Expand" in plan
    # formatted explain prints tree + detail per node: count scan DETAILS
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_v01_v02_class_tables_materialized(spark, sf_dir):
    """The k-anonymity / l-diversity class tables feed two consumers; the
    final plan must read the checkpointed bounded table (ExistingRDD),
    not re-scan the fact table per consumer."""
    for name in ("v01_k_anonymity_audit", "v02_l_diversity_entropy"):
        plan = explain_str(spark, sf_dir, name)
        assert "Scan ExistingRDD" in plan, name
        assert "Scan parquet" not in plan, name


def test_x06_no_cartesian_and_tiny_tail(spark, sf_dir):
    """The BH tail (ranking window, threshold max, rejection flags) runs
    on the checkpointed ≤125-row test table — no cartesian product, no
    fact re-scan."""
    plan = explain_str(spark, sf_dir, "x06_bh_fdr_screen")
    assert "CartesianProduct" not in plan
    assert "Scan parquet" not in plan  # fact join ran once, at checkpoint


def test_x08_bootstrap_tail_reads_replicate_table(spark, sf_dir):
    """The 201×-exploded fact aggregation materializes into the 201-row
    replicate table exactly once; order statistics + SE read it, never
    the fact table."""
    plan = explain_str(spark, sf_dir, "x08_poisson_bootstrap_ci")
    assert "Scan parquet" not in plan


def test_g03_frontier_joins_broadcast(spark, sf_dir):
    """BFS hops must broadcast the frontier side against the edge table —
    a shuffle join would re-exchange the full edge set per hop."""
    plan = explain_str(spark, sf_dir, "g03_supply_chain_reach")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_f05_small_table_joins_broadcast(spark, sf_dir):
    """Everything after the single monthly aggregation runs on the
    calendar-bounded table: all joins broadcast (checkpoint loses stats,
    so the hints are explicit), no sort-merge exchange."""
    plan = explain_str(spark, sf_dir, "f05_ewma_backtest")
    assert "SortMergeJoin" not in plan
    assert "Scan parquet" not in plan


def test_t45_u09_no_global_window(spark, sf_dir):
    """t45's global length rank comes from the distributed prefix sum and
    u09 is pure aggregation — a Window operator would mean a
    single-partition ORDER BY over the fact data."""
    for name in ("t45_batch_padding_efficiency", "u09_partition_skew_audit"):
        plan = explain_str(spark, sf_dir, name)
        assert "Window" not in plan, name


def test_m11_header_parse_is_jvm_side(spark, sf_dir):
    """The IHDR parse must stay in whole-stage codegen: exactly one
    Python stage in the whole plan (the fixture renderer), none for the
    audit itself."""
    plan = explain_str(spark, sf_dir, "m11_png_header_audit")
    # one Python stage total (the fixture renderer's detail line); the
    # parse itself is conv(hex(substring(...))) inside a JVM Project
    assert plan.count("Arguments: render(") == 1
    assert "ArrowEvalPython" not in plan
    assert "conv(hex(substring(content" in plan


def test_q82_uses_union_loop(spark, sf_dir):
    """WITH RECURSIVE must plan as the native UnionLoop operator (one
    distributed self-map per level), not fall back to anything
    driver-side. The builder eagerly checkpoints so it can restore the
    recursion-row-limit conf before returning (the r7 conf-leak fix), so
    the recursive plan is inspected on the inner SQL, and the builder's
    returned frame must be exactly that pinned checkpoint."""
    import contextlib
    import io

    from dibimbing_case_study_etl_spark.catalog import register
    from dibimbing_case_study_etl_spark.queries.llm_ops15 import _Q82_SPARK_SQL

    t = register(spark, sf_dir, ("part",))
    t["part"].createOrReplaceTempView("part")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql(_Q82_SPARK_SQL).explain("formatted")
    assert "UnionLoop" in buf.getvalue()
    plan = explain_str(spark, sf_dir, "q82_recursive_part_closure")
    assert "Scan ExistingRDD" in plan  # the conf-scoping eager checkpoint


def test_r08_no_window_single_scan(spark, sf_dir):
    """df computation is explode → distinct → agg, materialized once: the
    final plan reads the checkpointed vocab table, never the corpus."""
    plan = explain_str(spark, sf_dir, "r08_index_capacity_stats")
    assert "Window" not in plan
    assert "Scan ExistingRDD" in plan
    assert plan.count("Location: InMemoryFileIndex") == 0


def test_u10_v05_single_fact_scan(spark, sf_dir):
    """Both planners are single-chain aggregations — exactly one scan."""
    for name in ("u10_compaction_planner", "v05_generalization_ladder"):
        plan = explain_str(spark, sf_dir, name)
        assert plan.count("Location: InMemoryFileIndex") == 1, name
        assert "Window" not in plan, name


def test_q83_spatial_join_is_equi_not_nested_loop(spark, sf_dir):
    """The neighbor join must key on grid-cell ids (hash/sort-merge
    exchange) — a nested-loop or cartesian here means the 9-cell
    bucketing failed and the plan is O(n²)."""
    plan = explain_str(spark, sf_dir, "q83_spatial_neighbor_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_f06_small_table_joins_broadcast(spark, sf_dir):
    """Everything after the checkpointed monthly aggregation runs on
    calendar-bounded tables with broadcast self-joins — no sort-merge
    exchange, no fact re-scan."""
    plan = explain_str(spark, sf_dir, "f06_forecast_reconciliation")
    assert "SortMergeJoin" not in plan
    assert "Scan parquet" not in plan


def test_u11_anchor_scan_is_single_column(spark, sf_dir):
    """u11 deliberately scans twice: the max-ts anchor pass must be
    column-pruned to ts alone (cheap at any scale), the policy pass
    reads the payload columns. Checkpointing the fact table to make it
    one scan would be WORSE at 100 TB."""
    plan = explain_str(spark, sf_dir, "u11_retention_policy_simulator")
    assert plan.count("Location: InMemoryFileIndex") == 2
    anchor = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema: ")[1:]
        if "ts" in seg.splitlines()[0]
    ]
    assert any(
        "event_type" not in line and "props" not in line for line in anchor
    ), anchor


def test_t46_single_checkpointed_projection(spark, sf_dir):
    """Both the pre- and post-dedup aggregations must read the one
    checkpointed narrow projection — no second corpus scan."""
    plan = explain_str(spark, sf_dir, "t46_dedup_survivorship_report")
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan


def test_x09_reuses_checkpointed_welch_table(spark, sf_dir):
    """x09's χ² runs on x06's checkpointed Welch table — no fact scan in
    the final plan, no window (the histogram is a 10-row aggregation)."""
    plan = explain_str(spark, sf_dir, "x09_aa_pvalue_calibration")
    assert "Scan parquet" not in plan
    assert "Window" not in plan


def test_s21_overfetch_sweep_reads_checkpointed_top(spark, sf_dir):
    """The 4-setting sweep re-ranks the ONE checkpointed global top-50 —
    the corpus scans happened inside the two exact passes, not per
    setting."""
    plan = explain_str(spark, sf_dir, "s21_filtered_ann_recall")
    assert "Scan parquet" not in plan


def test_p04_one_fact_pass(spark, sf_dir):
    """Ladder choice, k gate, and noisy release all read the one
    checkpointed class table — no second customer scan, no window."""
    plan = explain_str(spark, sf_dir, "p04_private_release_pipeline")
    assert "Scan parquet" not in plan
    assert "Window" not in plan


def test_m12_crc_validation_is_jvm_side(spark, sf_dir):
    """CRC triage must not decode: one Python stage total (the fixture
    renderer), the validation itself is crc32/substring in a Project."""
    plan = explain_str(spark, sf_dir, "m12_png_crc_quarantine")
    assert plan.count("Arguments: render(") == 1
    assert "ArrowEvalPython" not in plan
    assert "crc32" in plan


def test_t47_novelty_has_no_join(spark, sf_dir):
    """Novelty must fall out of conditional counts in ONE aggregation per
    n — any join node means the anti-join shape snuck back in."""
    plan = explain_str(spark, sf_dir, "t47_ngram_novelty_rate")
    assert "Join" not in plan


def test_f07_single_fact_scan_bounded_windows(spark, sf_dir):
    """CUSUM reads orders ONCE (one partial-aggregable groupBy(day); the
    baseline totals are window aggregates over the same bounded calendar
    partition, so no second scan and no join exist); the prefix-sum/
    running-min windows run under the sanctioned constant partition key —
    never a corpus-scale single-partition sort."""
    plan = explain_str(spark, sf_dir, "f07_cusum_changepoint")
    assert plan.count("Location: InMemoryFileIndex") == 1  # one orders scan
    assert "Join" not in plan
    assert "SPARK_PARTITION_ID() * 0" in plan  # global_bounded(), not bare orderBy


def test_t48_sketch_broadcasts_to_probe(spark, sf_dir):
    """The D×W counter table (≤1024 rows) must BROADCAST to the top-k
    probe — a shuffle join there would repartition the corpus-derived
    exact-count table by (j, bucket) for a 30-row probe side. The token
    stream collapses via hash aggregation (map-side combine), and no
    Python stage exists anywhere."""
    plan = explain_str(spark, sf_dir, "t48_countmin_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_m02_m03_single_python_hop_per_stage(spark, sf_dir):
    """The real-codec queries are render → parse/resize: exactly two
    Arrow-batched Python stages (fixture renderer + codec), nothing else
    leaves the JVM, and no shuffle beyond the two partition spreads."""
    for name, codec_fn in (
        ("m02_image_resize_pipeline", "resize("),
        ("m03_video_frame_sample", "sample("),
    ):
        plan = explain_str(spark, sf_dir, name)
        assert plan.count("Arguments: render(") == 1, name
        assert plan.count(f"Arguments: {codec_fn}") == 1, name
        assert "SortMergeJoin" not in plan, name


def test_codec_queries_single_exchange(spark, sf_dir):
    """r8: the synth_*_table producers already hash-spread by doc_id, so
    the codec consumers take spread=False and each real-codec query plan
    carries exactly ONE exchange (the producer's spread) — the r7 shape
    re-shipped every blob through a second same-key exchange for zero
    rebalancing gain, which at scale doubles the decode pipeline's
    network cost."""
    import re

    for name in (
        "m02_image_resize_pipeline",
        "m03_video_frame_sample",
        "m04_audio_resample",
        "m07_png_decode_features",
        "m14_jpeg_decode_stats",
    ):
        plan = explain_str(spark, sf_dir, name)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, name


def test_m14_jpeg_two_python_stages_no_join(spark, sf_dir):
    """m14 is render → decode: two Arrow-batched Python stages, nothing
    else leaves the JVM, no join anywhere, and the scan is pruned to the
    single doc_id column (the fixtures are id-derived)."""
    plan = explain_str(spark, sf_dir, "m14_jpeg_decode_stats")
    assert plan.count("Arguments: render(") == 1
    assert plan.count("Arguments: decode(") == 1
    assert "Join" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_m15_colour_codec_single_exchange_pruned_scan(spark, sf_dir):
    """m15 mirrors m14's plan shape across the colour path: render →
    decode are the only Python stages, one exchange total (the
    producer's doc_id spread, consumer takes spread=False), no join,
    and the scan is pruned to doc_id (fixtures are id-derived)."""
    import re

    plan = explain_str(spark, sf_dir, "m15_jpeg_color_decode_stats")
    assert plan.count("Arguments: render(") == 1
    assert plan.count("Arguments: decode(") == 1
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_t50_single_corpus_scan_broadcast_scalar(spark, sf_dir):
    """t50's vocabulary-growth fit: the corpus-size scalar reaches the
    token explode as a BROADCAST nested-loop (single-row side), never a
    shuffled join; the documents scan is pruned to (doc_id, text); and
    the plan carries no sort-merge join anywhere — the decile assignment
    is pure arithmetic, not a global sort."""
    plan = explain_str(spark, sf_dir, "t50_vocab_growth_heaps")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_x10_single_fact_scan_no_shuffled_join(spark, sf_dir):
    """x10's SPRT monitor reads the events fact exactly once, pruned to
    the three columns the trial derivation needs; the total-count scalar
    broadcasts; cumulative checkpoints ride a 20-row window — no
    sort-merge join, no second fact scan."""
    import re

    plan = explain_str(spark, sf_dir, "x10_sprt_ab_monitor")
    # events fact + count scalar (detail-section occurrences)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string>" in plan


def test_q86_broadcast_fences_single_fact_partitioned_percentiles(spark, sf_dir):
    """q86's two percentile stages join back to the fact via BROADCAST
    (5-row median/MAD sides), never a shuffled join, and the events scan
    is pruned to the two columns the statistic needs."""
    plan = explain_str(spark, sf_dir, "q86_mad_robust_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ReadSchema: struct<event_type:string,value:double>" in plan


def test_g05_assortativity_pruned_scan_no_cartesian(spark, sf_dir):
    """g05's edge list comes from an equi-join on l_orderkey (the part
    inequality is a post-join filter, not a nested-loop condition), the
    lineitem scan is pruned to (orderkey, partkey), and no cartesian
    product appears anywhere."""
    plan = explain_str(spark, sf_dir, "g05_degree_assortativity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_m16_420_codec_single_exchange_pruned_scan(spark, sf_dir):
    """m16 carries the m14/m15 plan shape across the 4:2:0 path: render
    → decode are the only Python stages, one exchange total (producer's
    doc_id spread, consumer takes spread=False), no join, scan pruned
    to doc_id."""
    import re

    plan = explain_str(spark, sf_dir, "m16_jpeg_420_decode_stats")
    assert plan.count("Arguments: render(") == 1
    assert plan.count("Arguments: decode(") == 1
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "ReadSchema: struct<doc_id:bigint>" in plan
