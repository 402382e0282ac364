"""Third relational batch: remaining TPC-H query shapes (two-nation volume,
market share, top-supplier view, null-aware NOT IN, nested IN with HAVING),
array aggregation, the datetime surface, and Python-UDF parity demos
(vectorized pandas_udf and grouped applyInPandas with exact oracles —
possible because their arithmetic is the same IEEE double ops the SQL
engines run).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    davg,
    dsum,
    iround,
    sql_davg,
    sql_dsum,
    sql_iround,
)
from dibimbing_case_study_etl_spark.queries import query

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q38_two_nation_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {sql_dsum(_REV, 4)} AS volume
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cust_nation, supp_nation, l_year
    """,
    tags=("join", "agg"),
)
def q38_two_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations, both directions.

    Scale: the 25-row nation table is hint-broadcast into customer/supplier;
    the nation-filtered customer/supplier paths themselves are
    SF-proportional, so their fact joins carry no hint (AQE broadcasts at
    bench SF, shuffles at cluster scale). lineitem⋈orders is the single
    guaranteed fact shuffle."""
    t = register(spark, sf_dir, ("lineitem", "orders", "supplier", "customer", "nation"))
    nations = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    cust = t["customer"].join(
        F.broadcast(nations.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    ).select("c_custkey", "cust_nation")
    supp = t["supplier"].join(
        F.broadcast(nations.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), 4).alias("volume"))
    )


@query(
    "q39_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {sql_iround(
               "(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN CAST(round_even((" + _REV + ") * 10000, 0) AS BIGINT) ELSE 0 END) / 10000.0)"
               " / (SUM(CAST(round_even((" + _REV + ") * 10000, 0) AS BIGINT)) / 10000.0)", 6)} AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    GROUP BY o_year
    """,
    tags=("join", "agg", "ratio"),
)
def q39_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total supply volume per year
    (conditional / total ratio of exact-integer sums)."""
    t = register(spark, sf_dir, ("lineitem", "orders", "supplier", "nation"))
    supp = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    cents = F.call_function("rint", _rev() * 10000).cast("bigint")
    national = F.sum(F.when(F.col("n_name") == "NATION_3", cents).otherwise(F.lit(0))) / 10000.0
    total = F.sum(cents) / 10000.0
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(iround(national / total, 6).alias("mkt_share"))
    )


@query(
    "q40_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum(_REV, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "subquery", "view"),
)
def q40_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue — an aggregate
    view consumed twice (per-supplier revenue + its max). The revenue values
    are exact-integer sums, so the equality-with-max filter is
    engine-independent."""
    t = register(spark, sf_dir, ("lineitem", "supplier"))
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev(), 4).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q41_not_in_null_aware",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    )
    GROUP BY p_brand
    """,
    tags=("subquery", "anti", "sql-entry"),
)
def q41_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN through the SQL entry point — planned as a null-aware anti
    join (stricter than NOT EXISTS: any null in the subquery empties the
    result), the plan shape TPC-H Q16 exercises."""
    register(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (
          SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        )
        GROUP BY p_brand
        """
    )


@query(
    "q42_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity', 0)} AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("subquery", "semi", "agg"),
)
def q42_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold — IN over
    a grouped HAVING subquery, planned as a semi join on the aggregated key."""
    t = register(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        t["lineitem"]
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("l_orderkey") == F.col("bk"), "inner")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), 0).alias("total_qty"))
    )


@query(
    "q43_array_agg",
    oracle="""
    SELECT n_name,
           string_agg(c_name, '|' ORDER BY c_name) AS customers,
           COUNT(*) AS n_customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("agg", "array"),
)
def q43_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic order: collect_list is
    partition-order-dependent, so the engine always sorts collected arrays
    (sort_array ≡ DuckDB's list(... ORDER BY)). The driver-facing cell is
    the sorted array joined to a `|`-delimited string — scalar cells, same
    information — because the driver's result canonicalizer sorts frames
    with pandas and crashes on unhashable list cells (r2 verdict item 2)."""
    t = register(spark, sf_dir, ("nation", "customer"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias("customers"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "q44_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE))                    AS month_end,
           date_trunc('week', o_orderdate)                        AS week_start,
           date_trunc('quarter', o_orderdate)                     AS quarter_start,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)            AS dow_sun1,
           CAST(weekofyear(o_orderdate) AS INTEGER)               AS iso_week,
           CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER)         AS day_of_year,
           make_date(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER), 1, 1) AS year_start
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("scalar", "datetime"),
)
def q44_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface: last_day / trunc to week+quarter / day-of-week
    (normalized to Sunday=1 — DuckDB counts Sunday=0) / ISO week / doy."""
    t = register(spark, sf_dir, ("orders",))
    return t["orders"].filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey",
        # DATE-returning functions cast to timestamp: DuckDB's results come
        # back as midnight timestamps, and the value-hash compares types too
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("day_of_year"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).cast("timestamp").alias("year_start"),
    )


@query(
    "q45_pandas_udf_scalar",
    oracle=f"""
    SELECT event_id, {sql_iround('value * 1.1 + 2.0', 4)} AS adjusted
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("udf", "pandas"),
)
def q45_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf with an EXACT oracle: the Arrow batch
    computes the same IEEE double ops (x*1.1+2.0) the SQL engine would, so
    even a Python UDF stays inside the correctness gate. Demonstrates the
    sanctioned slow path: Arrow-batched, never row-at-a-time."""

    @F.pandas_udf("double")
    def adjust(s: pd.Series) -> pd.Series:
        return s * 1.1 + 2.0

    t = register(spark, sf_dir, ("events",))
    return (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select("event_id", iround(adjust(F.col("value")), 4).alias("adjusted"))
    )


@query(
    "q46_grouped_pandas_udf",
    oracle=f"""
    WITH stats AS (
      -- round_even matches pandas Series.round (numpy rint, half-even)
      SELECT event_type,
             SUM(CAST(round_even(value * 100, 0) AS BIGINT)) / 100.0 / COUNT(value) AS mean_v
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           {sql_iround('value - mean_v', 4)} AS centered
    FROM events e JOIN stats USING (event_type)
    """,
    tags=("udf", "pandas", "grouped"),
)
def q46_grouped_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas (per-group pandas DataFrame in/out) centering
    each event's value on its group mean — the mean uses the same
    exact-integer form as the SQL twin, so the grouped-UDF path is
    oracle-checked too."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")
        mean_v = cents.sum() / 100.0 / len(cents)
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "centered_raw": pdf["value"] - mean_v,
            }
        )
        return out

    t = register(spark, sf_dir, ("events",))
    out = (
        t["events"]
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(center, schema="event_id long, event_type string, centered_raw double")
    )
    return out.select("event_id", "event_type", iround(F.col("centered_raw"), 4).alias("centered"))
