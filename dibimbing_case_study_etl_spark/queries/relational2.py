"""Advanced relational surface: as-of / range joins (operators Spark lacks
natively, composed from windows and non-equi joins), percentiles, correlated
subqueries, GROUPING SETS via the SQL entry path, extended string functions,
and approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
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


@query(
    "q29_asof_join",
    oracle="""
    WITH enriched AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN struct_pack(ts := ts, event_id := event_id) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
      FROM events WHERE event_type IN ('view', 'purchase')
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           (last_view).event_id AS view_id,
           (last_view).ts AS view_ts,
           CAST(DATEDIFF('second', (last_view).ts, ts) AS BIGINT) AS gap_sec
    FROM enriched
    WHERE event_type = 'purchase'
    """,
    tags=("asof", "window", "events"),
)
def q29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the most
    recent prior-or-equal view by the same user.

    Composition: union the two event roles in one stream, carry the running
    maximum of (ts, event_id) structs over views — timestamps are
    monotonic in the window order, so the max struct IS the latest view.
    One shuffle on user_id; no per-group Python (the merge_asof-style
    applyInPandas fallback is never needed for backward as-of).
    """
    t = register(spark, sf_dir, ("events",))
    ev = t["events"].filter(F.col("event_type").isin("view", "purchase"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.struct("ts", "event_id"))
    ).over(w)
    return (
        ev.withColumn("last_view", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_view.event_id").alias("view_id"),
            F.col("last_view.ts").alias("view_ts"),
            (F.col("ts").cast("long") - F.col("last_view.ts").cast("long")).alias("gap_sec"),
        )
    )


@query(
    "q30_range_join",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id,
           COUNT(p.event_id) AS n_prior_5min,
           COALESCE(SUM(CAST(round_even(p.value * 100, 0) AS BIGINT)), 0) / 100.0 AS prior_value
    FROM events e
    LEFT JOIN events p
      ON p.user_id = e.user_id
     AND p.ts >= e.ts - INTERVAL 5 MINUTE
     AND p.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
    tags=("range-join", "events"),
)
def q30_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: activity in the 5 minutes before each error event.

    Plan: equi key (user_id) hashes; the range predicate filters inside the
    join. At 100 TB the range key would additionally be bucketized into
    coarse time buckets joined equi-wise so a sort-merge join can prune —
    noted here, unnecessary at the per-user row counts of this schema.
    """
    t = register(spark, sf_dir, ("events",))
    err = t["events"].filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id"), F.col("ts").alias("err_ts")
    )
    ev = t["events"].select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"), F.col("value").alias("p_value"),
    )
    joined = err.join(
        ev,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("err_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("p_ts") < F.col("err_ts")),
        "left",
    )
    return joined.groupBy("error_id", "user_id").agg(
        F.count("p_id").alias("n_prior_5min"),
        (
            F.coalesce(
                F.sum(F.call_function("rint", F.col("p_value") * 100).cast("bigint")), F.lit(0)
            )
            / 100.0
        ).alias("prior_value"),
    )


@query(
    "q31_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def q31_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``: both sort and linearly interpolate)."""
    t = register(spark, sf_dir, ("orders",))
    return t["orders"].groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q32_correlated_avg_subquery",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice', 2)} AS total_price, COUNT(*) AS n_small
    FROM lineitem
    WHERE l_quantity < (
      SELECT 0.5 * ({sql_davg('l2.l_quantity', 0)})
      FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
    )
    """,
    tags=("join", "subquery"),
)
def q32_correlated_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their part's average quantity.

    The correlated scalar subquery decorrelates into a per-part aggregate
    joined back to the fact — written that way directly (what Catalyst's
    DecorrelateInnerQuery does for the SQL form). The per-part aggregate is
    SF-proportional (one row per part), so it carries no broadcast hint:
    AQE broadcasts it at bench SF and falls back to a shuffle join on
    partkey at cluster scale. The average uses the exact-integer form so
    the comparison boundary is engine-independent.
    """
    t = register(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * davg(F.col("l_quantity"), 0)).alias("half_avg_qty")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q33_grouping_sets",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal', 2)} AS total_acctbal,
           CAST(GROUPING(r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n_name) AS INTEGER) AS g_nation
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
    tags=("grouping-sets", "sql-entry"),
)
def q33_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL entry point
    (``spark.sql`` over the registered views — parity with the reference's
    SQL-file execution path, `dag_upsert_for_l2.py:33-44`)."""
    register(spark, sf_dir, ("region", "nation", "customer"))
    return spark.sql(
        """
        SELECT r_name, n_name,
               COUNT(*) AS n_customers,
               SUM(CAST(rint(c_acctbal * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS total_acctbal,
               CAST(GROUPING(r_name) AS INT) AS g_region,
               CAST(GROUPING(n_name) AS INT) AS g_nation
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@query(
    "q34_string_functions",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1)                    AS first_word,
           upper(substring(p_name, 1, 3))                AS up3,
           lpad(p_brand, 12, '*')                        AS padded_brand,
           reverse(p_name)                               AS rev_name,
           CAST(strpos(p_name, 'widget') AS INTEGER)     AS widget_pos,
           regexp_extract(p_brand, '[0-9]+')             AS brand_num,
           translate(p_name, 'aeiou', 'AEIOU')           AS caps_vowels,
           repeat(substring(p_name, 1, 2), 2)            AS rep2,
           chr(65 + CAST(p_size % 26 AS INTEGER))        AS size_chr
    FROM part
    """,
    tags=("scalar", "string"),
)
def q34_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string-function surface (SURVEY §2.7 beyond the reference's
    needs): split/pad/reverse/locate/regexp/translate/repeat/chr."""
    t = register(spark, sf_dir, ("part",))
    return t["part"].select(
        "p_partkey",
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.upper(F.substring("p_name", 1, 3)).alias("up3"),
        F.lpad("p_brand", 12, "*").alias("padded_brand"),
        F.reverse("p_name").alias("rev_name"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.translate("p_name", "aeiou", "AEIOU").alias("caps_vowels"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("rep2"),
        F.chr(65 + F.col("p_size") % 26).alias("size_chr"),
    )


@query(
    "q35_sql_cte_ntile",
    oracle=f"""
    WITH cust_rev AS (
      SELECT o_custkey, {sql_dsum('o_totalprice', 2)} AS revenue, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, revenue, n_orders,
           CAST(NTILE(4) OVER (ORDER BY revenue DESC, o_custkey) AS INTEGER) AS quartile
    FROM cust_rev
    """,
    tags=("sql-entry", "window", "cte"),
)
def q35_sql_cte_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + NTILE through the SQL entry point: customer revenue quartiles."""
    register(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH cust_rev AS (
          SELECT o_custkey,
                 SUM(CAST(rint(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS revenue,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, revenue, n_orders,
               NTILE(4) OVER (ORDER BY revenue DESC, o_custkey) AS quartile
        FROM cust_rev
        """
    )


@query(
    "q36_scalar_subquery_anti",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_rich_inactive,
           {sql_dsum('c_acctbal', 2)} AS total_balance
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal', 2)} FROM customer)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("subquery", "anti"),
)
def q36_scalar_subquery_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances with no orders — scalar
    subquery (broadcast single-row cross join) + anti join. The average is
    exact-integer so the comparison boundary is engine-independent."""
    t = register(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"]
    avg_bal = cust.agg(davg(F.col("c_acctbal"), 2).alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rich_inactive"),
            dsum(F.col("c_acctbal"), 2).alias("total_balance"),
        )
    )


@query(
    "q37_approx_aggregates",
    oracle=None,  # approximate by design (HLL / KLL sketches); accuracy vs
    # the exact answers is asserted in tests/test_relational2.py
    tags=("agg", "approx"),
)
def q37_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates for 100 TB interactive profiling:
    approx_count_distinct (HyperLogLog++) and percentile_approx (KLL-style)
    — fixed-size state per group regardless of input size."""
    t = register(spark, sf_dir, ("lineitem",))
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
