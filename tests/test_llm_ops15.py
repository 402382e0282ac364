"""Semantic checks for the round-6 session-V operators (llm_ops15) —
properties the DuckDB oracle parity cannot see because both engines run
the same algorithm: boundary completeness (q83 vs brute force), BH's
prefix structure, privacy-ladder monotonicity under bucket nesting,
BFS containment, recursion census shape."""

from __future__ import annotations

import duckdb

from dibimbing_case_study_etl_spark.queries import load_all

REGISTRY = load_all()


def _run(spark, sf_dir, name):
    return REGISTRY[name].build(spark, sf_dir).toPandas()


def test_q83_grid_join_matches_brute_force(spark, sf_dir):
    """The 3×3 neighbor join must find EVERY pair within d — a missed
    cell-boundary case undercounts. Brute force the O(n²) ground truth
    in DuckDB on the small fixture and compare total pair counts."""
    from dibimbing_case_study_etl_spark.catalog import table_path

    pdf = _run(spark, sf_dir, "q83_spatial_neighbor_join")
    brute = duckdb.sql(
        f"""
        WITH pts AS (
          SELECT c_custkey AS id,
                 (CAST(('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 14))
                   AS BIGINT) % {1 << 26}) / {float(1 << 26)!r} AS lat,
                 (CAST(('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 14))
                   AS BIGINT) % {1 << 26}) / {float(1 << 26)!r} AS lon
          FROM read_parquet('{table_path(sf_dir, "customer")}')
        )
        SELECT COUNT(*) FROM pts a JOIN pts b ON a.id < b.id
        WHERE (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
              <= CAST(0.01 AS DOUBLE) * CAST(0.01 AS DOUBLE)
        """
    ).fetchone()[0]
    assert int(pdf["n_pairs"].sum()) == int(brute)
    assert (pdf["mean_dist"] <= 0.01 + 1e-12).all()


def test_x06_bh_rejections_are_a_rank_prefix(spark, sf_dir):
    """BH rejects exactly ranks 1..k* — the rejected set must be a prefix
    of the p-value ranking and every rejected p must sit under q."""
    pdf = _run(spark, sf_dir, "x06_bh_fdr_screen").sort_values("rnk")
    rej = pdf["rejected"].tolist()
    k = sum(rej)
    assert rej == [1] * k + [0] * (len(rej) - k)
    assert (pdf["p_value"] >= 0).all() and (pdf["p_value"] <= 1).all()
    if k:
        assert (pdf.head(k)["p_value"] <= 0.1).all()


def test_v01_thresholds_monotone(spark, sf_dir):
    """Raising k can only add at-risk classes/records."""
    pdf = _run(spark, sf_dir, "v01_k_anonymity_audit").sort_values("k")
    assert pdf["n_classes_below"].is_monotonic_increasing
    assert pdf["n_records_below"].is_monotonic_increasing


def test_v05_ladder_monotone_on_nested_rungs(spark, sf_dir):
    """Where a coarser width's buckets are unions of a finer width's
    (250⊂500⊂1000, 500⊂2500⊂5000), class sizes only grow, so the
    at-risk share can only shrink."""
    pdf = _run(spark, sf_dir, "v05_generalization_ladder").set_index("width")
    risk = pdf["at_risk_share"]
    for fine, coarse in ((250, 500), (500, 1000), (500, 2500), (2500, 5000)):
        assert risk[coarse] <= risk[fine] + 1e-12, (fine, coarse)


def test_v02_entropy_bounds(spark, sf_dir):
    """Entropy of an l-valued distribution lies in [0, ln l]; l=1 classes
    have exactly zero entropy."""
    import math

    pdf = _run(spark, sf_dir, "v02_l_diversity_entropy")
    for _, row in pdf.iterrows():
        assert -1e-9 <= row["min_entropy"] <= math.log(row["l"]) + 1e-9
        assert row["min_entropy"] - 1e-9 <= row["mean_entropy"]
        if row["l"] == 1:
            assert row["mean_entropy"] == 0.0


def test_x08_bootstrap_shape(spark, sf_dir):
    pdf = _run(spark, sf_dir, "x08_poisson_bootstrap_ci")
    row = pdf.iloc[0]
    assert row["n_boot"] == 200
    assert row["ci_lo"] < row["ci_hi"]
    assert row["boot_se"] > 0
    # percentile interval should bracket the point estimate on this data
    assert row["ci_lo"] <= row["est_diff"] <= row["ci_hi"]


def test_g03_reach_contains_seed_frontier(spark, sf_dir):
    """3-hop part set ⊇ 1-hop part set (the seed re-reaches itself at hop
    2 through any of its parts), and the 2-hop supplier set includes the
    seed itself."""
    pdf = _run(spark, sf_dir, "g03_supply_chain_reach")
    assert (pdf["n_parts_3hop"] >= pdf["n_parts_1hop"]).all()
    assert (pdf["n_suppliers_2hop"] >= 1).all()


def test_q82_census_shape(spark, sf_dir):
    """Depth 0 counts every part once; deeper levels only shrink (a part
    stops climbing once its chain hits the root)."""
    from dibimbing_case_study_etl_spark.catalog import table_path

    pdf = _run(spark, sf_dir, "q82_recursive_part_closure").sort_values("depth")
    n_parts = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{table_path(sf_dir, 'part')}')"
    ).fetchone()[0]
    assert pdf.iloc[0]["depth"] == 0 and pdf.iloc[0]["n_paths"] == n_parts
    assert pdf["n_paths"].is_monotonic_decreasing


def test_m11_headers_match_fixture_formula(spark, sf_dir):
    from dibimbing_case_study_etl_spark.catalog import table_path

    pdf = _run(spark, sf_dir, "m11_png_header_audit")
    assert (pdf["bit_depth"] == 8).all() and (pdf["color_type"] == 0).all()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{table_path(sf_dir, 'documents')}')"
    ).fetchone()[0]
    assert int(pdf["n_images"].sum()) == n_docs


def test_t45_padding_invariants(spark, sf_dir):
    """The real token total is partition-invariant (every doc lands in
    exactly one batch), shares are consistent with the integer sums, and
    batch counts match ceil-division per bucket count. (Monotonicity in
    bucket count is NOT a theorem — batch-boundary effects dominate on
    the near-uniform-length fixture corpus — so it is not asserted.)"""
    pdf = _run(spark, sf_dir, "t45_batch_padding_efficiency").sort_values("n_buckets")
    assert pdf["real_tokens"].nunique() == 1
    assert (pdf["padding_share"] >= 0).all() and (pdf["padding_share"] < 1).all()
    for _, row in pdf.iterrows():
        tot = row["padded_tokens"] + row["real_tokens"]
        assert abs(row["padding_share"] - row["padded_tokens"] / tot) < 1e-6


def test_u10_planner_invariants(spark, sf_dir):
    pdf = _run(spark, sf_dir, "u10_compaction_planner")
    assert (pdf["planned_files"] >= 1).all()
    assert (pdf["file_reduction"] <= 1.0).all()
    assert (pdf["n_files_now"] <= 24).all()  # hourly landing model


def test_v04_release_reproducible_and_bounded(spark, sf_dir):
    """Same seed → same noise on re-run; the release must differ from the
    true counts (noise actually applied) but not be absurd."""
    a = _run(spark, sf_dir, "v04_dp_noisy_release")
    b = _run(spark, sf_dir, "v04_dp_noisy_release")
    assert a.equals(b)
    assert (a["abs_noise"] > 0).any()
    # Laplace(2) tail: P(|noise| > 40) = e^-20 — astronomically unlikely
    # across 25 draws unless the inverse CDF is wrong
    assert (a["abs_noise"] < 40).all()


def test_q84_uniformity_estimate_underestimates(spark, sf_dir):
    """Cauchy–Schwarz: Σc² ≥ (Σc)²/d, so the uniformity estimate can
    only UNDER-estimate a self-join — q_error ≥ 1 in every bucket, and
    strictly > 1 somewhere on this skewed data (non-vacuous)."""
    pdf = _run(spark, sf_dir, "q84_join_cardinality_estimate")
    assert (pdf["q_error"] >= 1.0 - 1e-9).all()
    assert (pdf["actual_rows"] >= pdf["est_rows"]).all()
    assert (pdf["q_error"] > 1.0).any()


def test_v06_distance_bounds(spark, sf_dir):
    """Total-variation distance lives in [0, 1]; violations can't exceed
    classes; the weighted mean can't exceed the max."""
    row = _run(spark, sf_dir, "v06_t_closeness_audit").iloc[0]
    assert 0.0 <= row["mean_distance_weighted"] <= row["max_distance"] <= 1.0 + 1e-9
    assert row["n_violations"] <= row["n_classes"]


def test_p04_release_accounting(spark, sf_dir):
    """Released + suppressed must cover every class of the chosen rung,
    per nation; ε is the single parallel-composition budget."""
    pdf = _run(spark, sf_dir, "p04_private_release_pipeline")
    assert (pdf["epsilon"] == 0.5).all()
    assert (pdf["n_released"] + pdf["n_suppressed"] > 0).all()
    assert (pdf["n_released"] >= 0).all() and (pdf["n_suppressed"] >= 0).all()


def test_q85_reach_curve_shape(spark, sf_dir):
    """Cumulative reach is non-decreasing, ends at the total distinct
    user count, and each day's new users are bounded by its DAU."""
    import duckdb

    from dibimbing_case_study_etl_spark.catalog import table_path

    pdf = _run(spark, sf_dir, "q85_cumulative_distinct_users").sort_values("day")
    assert pdf["cumulative_users"].is_monotonic_increasing
    assert (pdf["new_users"] <= pdf["dau"]).all()
    total = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{table_path(sf_dir, 'events')}')"
    ).fetchone()[0]
    assert pdf["cumulative_users"].iloc[-1] == total
    assert pdf["new_users"].sum() == total


def test_f06_nonlinear_forecast_has_real_coherence_gap(spark, sf_dir):
    """The momentum adjustment exists to make levels NOT add up — a zero
    coherence gap everywhere would mean the audit is vacuous (the
    seasonal-naive trap)."""
    pdf = _run(spark, sf_dir, "f06_forecast_reconciliation")
    assert (pdf["coherence_gap_share"] > 0).any()
    assert (pdf["direct_wape"] > 0).all() and (pdf["bottomup_wape"] > 0).all()


def test_u11_retention_monotone(spark, sf_dir):
    """A longer window keeps at least as much; rows partition exactly."""
    pdf = _run(spark, sf_dir, "u11_retention_policy_simulator").sort_values(
        "window_days"
    )
    assert pdf["rows_retained"].is_monotonic_increasing
    assert pdf["bytes_retained"].is_monotonic_increasing
    assert (pdf["rows_retained"] + pdf["rows_purged"]).nunique() == 1


def test_t46_survivorship_conserves_mass(spark, sf_dir):
    """Keepers are a subset of documents: global post-counts equal the
    distinct-text count and never exceed pre-counts; token mass only
    shrinks globally (per source it may SHIFT across sources)."""
    import duckdb

    from dibimbing_case_study_etl_spark.catalog import table_path

    pdf = _run(spark, sf_dir, "t46_dedup_survivorship_report")
    n_texts = duckdb.sql(
        f"SELECT COUNT(DISTINCT text) FROM read_parquet('{table_path(sf_dir, 'documents')}')"
    ).fetchone()[0]
    assert pdf["n_docs_post"].sum() == n_texts
    assert pdf["n_docs_post"].sum() <= pdf["n_docs_pre"].sum()
    assert pdf["tokens_post"].sum() <= pdf["tokens_pre"].sum()


def test_t48_countmin_never_underestimates(spark, sf_dir):
    """The Count-Min one-sided guarantee: every estimate ≥ its true count
    (counters only ever add mass), and the probed set is exactly the
    top-k by true count."""
    pdf = _run(spark, sf_dir, "t48_countmin_heavy_hitters")
    assert (pdf["overestimate"] >= 0).all()
    assert (pdf["est_count"] >= pdf["true_count"]).all()
    assert (pdf["err_ratio"] >= 1.0).all()
    import duckdb

    from dibimbing_case_study_etl_spark.catalog import table_path

    kth = duckdb.sql(
        f"""
        WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS w
                     FROM read_parquet('{table_path(sf_dir, 'documents')}')),
        c AS (SELECT w, COUNT(*) AS c FROM tok WHERE w <> '' GROUP BY w)
        SELECT MIN(c) FROM (SELECT c FROM c ORDER BY c DESC, w LIMIT {len(pdf)})
        """
    ).fetchone()[0]
    assert pdf["true_count"].min() == kth


def test_f07_cusum_structure(spark, sf_dir):
    """CUSUM invariants: both accumulators are non-negative everywhere
    (S = P − min(0, running-min P) ≥ 0 by construction), alarms are
    binary and only fire where the accumulator is large, and the daily
    revenue reconciles with a direct aggregation."""
    pdf = _run(spark, sf_dir, "f07_cusum_changepoint").sort_values("d")
    assert (pdf["cusum_up"] >= 0).all() and (pdf["cusum_down"] >= 0).all()
    assert set(pdf["alarm_up"].unique()) <= {0, 1}
    assert set(pdf["alarm_down"].unique()) <= {0, 1}
    # an alarm day must carry a strictly larger accumulator than every
    # non-alarm day (the threshold is one global constant)
    for side in ("up", "down"):
        fired = pdf[pdf[f"alarm_{side}"] == 1][f"cusum_{side}"]
        quiet = pdf[pdf[f"alarm_{side}"] == 0][f"cusum_{side}"]
        if len(fired) and len(quiet):
            assert fired.min() > quiet.max()
    import duckdb

    from dibimbing_case_study_etl_spark.catalog import table_path

    total = duckdb.sql(
        f"SELECT SUM(CAST(round_even(o_totalprice, 0) AS BIGINT)) "
        f"FROM read_parquet('{table_path(sf_dir, 'orders')}')"
    ).fetchone()[0]
    assert pdf["revenue"].sum() == total
