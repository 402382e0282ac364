"""Behavioral checks for the advanced relational set beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.queries import load_all

REGISTRY = load_all()


def test_asof_join_semantics(spark, sf_dir):
    out = REGISTRY["q29_asof_join"].build(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # a matched view is never after its purchase
    assert all(r.gap_sec >= 0 for r in rows if r.view_ts is not None)
    # purchases with no prior view yield nulls, not dropped rows
    n_purchases = (
        REGISTRY["q29_asof_join"].build(spark, sf_dir).count()
    )
    from dibimbing_case_study_etl_spark.catalog import register

    t = register(spark, sf_dir, ("events",))
    assert n_purchases == t["events"].filter(F.col("event_type") == "purchase").count()


def test_approx_aggregates_accuracy(spark, sf_dir):
    from dibimbing_case_study_etl_spark.catalog import register

    t = register(spark, sf_dir, ("lineitem",))
    exact = {
        r.l_returnflag: (r.n_distinct, r.median)
        for r in t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_distinct"),
            F.percentile("l_extendedprice", 0.5).alias("median"),
        )
        .collect()
    }
    approx = REGISTRY["q37_approx_aggregates"].build(spark, sf_dir).collect()
    for r in approx:
        nd, med = exact[r.l_returnflag]
        assert abs(r.approx_orders - nd) / nd < 0.05
        assert abs(r.approx_median_price - med) / med < 0.05
