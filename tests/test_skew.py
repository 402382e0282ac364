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
