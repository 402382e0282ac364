"""salted_join must be result-identical to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.operators.skew import salted_join


def canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_join_equivalence(spark, sf_dir):
    t = register(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_partkey", "l_orderkey", "l_quantity")
    part = t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    cols = ["l_partkey", "l_orderkey", "p_brand"]
    plain = canon(li.join(part, "l_partkey"), cols)
    salted = canon(salted_join(li, part, ["l_partkey"], n_salts=8), cols)
    assert plain == salted and len(plain) > 0


def test_salted_left_join_equivalence(spark, sf_dir):
    t = register(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"].select(F.col("c_custkey").alias("k"), "c_name")
    orders = t["orders"].select(F.col("o_custkey").alias("k"), "o_orderkey")
    cols = ["k", "c_name", "o_orderkey"]
    plain = canon(cust.join(orders, "k", "left"), cols)
    salted = canon(salted_join(cust, orders, ["k"], n_salts=4, how="left"), cols)
    assert plain == salted


def test_salted_join_rejects_bad_args(spark, sf_dir):
    t = register(spark, sf_dir, ("customer",))
    with pytest.raises(ValueError):
        salted_join(t["customer"], t["customer"], ["c_custkey"], how="right")


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """AQE skew-join handling: with one key holding ~half the fact rows,
    the executed plan must mark the sort-merge join skew-handled (the
    skewed partition splits into multiple tasks) — the runtime complement
    to explicit salting for the keys you didn't predict."""
    from dibimbing_case_study_etl_spark.catalog import load_table

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink thresholds so test-scale data can exhibit "skew"
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        # funnel half the rows onto one hot key
        skewed = li.withColumn(
            "k", F.when(F.col("l_orderkey") % 2 == 0, F.lit(0)).otherwise(F.col("l_orderkey"))
        )
        dim = skewed.select("k").distinct()
        joined = skewed.join(dim, "k").groupBy("k").count()
        joined.collect()  # AQE decides skew handling at runtime
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: with half the probe rows on one hot key,
    the executed plan must mark the sort-merge join skew-handled
    (SortMergeJoin(skew=true): the hot partition splits into multiple
    tasks, the build side duplicates opposite them) — the runtime
    complement to explicit salting for keys you didn't predict."""
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    try:
        # scale the byte thresholds down so test-scale shuffles can
        # qualify as "skewed" (defaults are 256MB/64MB)
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        fact = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.repeat(F.lit("x"), 64).alias("pad"),
        )
        dim = spark.range(200_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        joined = fact.join(dim, "k").select(F.count(F.lit(1)).alias("n"))
        [row] = joined.collect()
        assert row.n == 200_000  # k=0 matches dim's single 0 row: row count preserved
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
