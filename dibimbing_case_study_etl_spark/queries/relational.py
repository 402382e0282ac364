"""Relational query surface (SURVEY §2.3–§2.9).

The reference itself has almost no relational operators (its only window is
the ROW_NUMBER dedup, `scripts/sql/l2_tables/upsert_l2_for_ds.sql:10-13`, and
its only merge is the Postgres ON CONFLICT upsert), but the engine exposes the
full Spark surface — joins, aggregations, windows, set ops, sorts/limits,
rollup/cube, pivot — validated query-by-query against the DuckDB oracle.

All float aggregates go through ``functions.oracle_safe`` (scaled-integer
sums) so results are order-independent — identical under any partitioning /
AQE re-plan, and hash-identical to the single-node oracle. Scale notes are
attached per query: which side broadcasts, where the shuffle is, and why the
plan survives 100 TB.
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

# revenue expression used throughout: per-line discounted price
_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity', 0)}            AS sum_qty,
      {sql_dsum('l_extendedprice', 2)}       AS sum_base_price,
      {sql_dsum(_REV, 4)}                    AS sum_disc_price,
      {sql_dsum(_REV + ' * (1 + l_tax)', 4)} AS sum_charge,
      {sql_davg('l_quantity', 0)}            AS avg_qty,
      {sql_davg('l_extendedprice', 2)}       AS avg_price,
      {sql_davg('l_discount', 2)}            AS avg_disc,
      COUNT(*)                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash aggregate.

    Scale: filter + 2-col grouping key push into the parquet scan
    (PushedFilters + ReadSchema pruning); partial aggregation map-side, so the
    shuffle carries only (flag, status) groups — a few dozen rows per task
    regardless of input size.
    """
    t = register(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 0).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(_rev(), 4).alias("sum_disc_price"),
            dsum(_rev() * (1 + F.col("l_tax")), 4).alias("sum_charge"),
            davg(F.col("l_quantity"), 0).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q06_revenue_filter",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
    bench=True,
)
def q06_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective-filter global aggregate.

    Scale: all four predicates are min/max-stat-prunable parquet pushdowns;
    the aggregate is a single partial+final sum — no wide shuffle at all.
    """
    t = register(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@query(
    "q11_group_having",
    oracle=f"""
    SELECT l_suppkey, {sql_dsum(_REV, 4)} AS revenue, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 100
    """,
    tags=("agg",),
)
def q11_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate with a HAVING filter on the aggregate."""
    t = register(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(dsum(_rev(), 4).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > 100)
    )


@query(
    "q18_distinct_counts",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers,
           {sql_davg('c_acctbal', 2)} AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "distinct"),
)
def q18_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates (Spark expand+two-phase agg)."""
    t = register(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            davg(F.col("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {sql_dsum(_REV, 4)} AS revenue, o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + aggregate + deterministic top-k.

    Scale: customer grows with SF, so its join carries no hint — AQE
    broadcasts the filtered segment at bench SF and shuffles past the
    threshold. orders⋈lineitem is the one real shuffle, on orderkey. Top-k
    is TakeOrderedAndProject — no global sort materialization. LIMIT is
    made deterministic with a total tiebreak.
    """
    t = register(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n_name, {sql_dsum(_REV, 4)} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: fact table joined through three dims.

    Scale: region/nation are fixed-size → hinted broadcasts; customer grows
    with SF, so the dims join carries no hint (AQE broadcasts it at bench
    SF, shuffles past the threshold). The only guaranteed shuffle is
    lineitem⋈orders on orderkey, then a narrow hash agg on n_name.
    """
    t = register(spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem"))
    dims = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


@query(
    "q04_priority_semi_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_discount > 0.05
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi"),
)
def q04_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (TPC-H Q4 shape).

    Scale: semi join emits each orders row at most once and carries no
    lineitem columns — cheaper than inner-join+distinct by construction.
    """
    t = register(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q07_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    t = register(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q09_nation_year_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum(_REV, 4)} AS profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
    tags=("join", "agg"),
    bench=True,
)
def q09_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style multi-dim profit rollup with a LIKE-filtered dim.

    Scale: only fixed-size nation carries a broadcast hint. part and
    supplier grow with SF — at 100 TB a hard ``F.broadcast`` on them OOMs
    executors, so AQE decides their join strategy from runtime sizes
    (it still broadcasts them at bench SF, shuffles them past the
    threshold). lineitem⋈orders on orderkey is the single guaranteed
    shuffle; grouping key (nation, year) is tiny.
    """
    t = register(spark, sf_dir, ("lineitem", "supplier", "orders", "nation", "part"))
    part = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), 4).alias("profit"))
    )


@query(
    "q10_returned_revenue_topk",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, {sql_dsum(_REV, 4)} AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns, top-20 customers.

    Scale: nation (25 rows, fixed) is broadcast; customer grows with SF so
    its join carries NO hint — AQE broadcasts it at bench SF and falls back
    to shuffle join at cluster scale instead of OOMing on a forced
    multi-GB broadcast.
    """
    t = register(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    cust = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    )
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_shipmode_case_when",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "case"),
)
def q12_shipmode_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE WHEN inside SUM)."""
    t = register(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "agg", "outer"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join + two-level aggregation (count of counts)."""
    t = register(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT {sql_iround(
        "100.0 * (SUM(CASE WHEN p_type = 'PROMO' THEN CAST(round_even((" + _REV + ") * 10000, 0) AS BIGINT) ELSE 0 END) / 10000.0)"
        " / (SUM(CAST(round_even((" + _REV + ") * 10000, 0) AS BIGINT)) / 10000.0)", 4)} AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: broadcast dim join + ratio-of-sums."""
    t = register(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cents = F.call_function("rint", _rev() * 10000).cast("bigint")
    promo_sum = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))) / 10000.0
    total_sum = F.sum(cents) / 10000.0
    return li.join(
        t["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey")
    ).agg(iround(100.0 * promo_sum / total_sum, 4).alias("promo_share_pct"))


@query(
    "q19_theta_join_ranges",
    oracle=f"""
    SELECT {sql_dsum(_REV, 4)} AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "theta"),
)
def q19_theta_join_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join plus disjunctive range predicates across
    both sides (the theta part evaluates post-join, equi key still hashes).
    part is SF-proportional → no broadcast hint; AQE picks the strategy."""
    t = register(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        dsum(_rev(), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@query(
    "q02_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS total_price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("sort", "topk"),
)
def q02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with total-order tiebreak (TakeOrderedAndProject —
    per-partition heaps, no full sort; survives any input size)."""
    t = register(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("total_price"), "o_orderdate")
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(15)
    )


@query(
    "q15_set_ops",
    oracle="""
    SELECT 'both' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'only_seg' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
    tags=("setop",),
)
def q15_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result, labeled by op.

    Scale: Spark plans INTERSECT/EXCEPT as (semi/anti) hash joins over
    distinct keys — same shuffle shape as a join on c_custkey.
    """
    t = register(spark, sf_dir, ("customer", "orders"))
    seg = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    fin = t["orders"].filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    both = seg.intersect(fin).select(F.lit("both").alias("op"), "c_custkey")
    only_seg = seg.exceptAll(fin.distinct()).distinct().select(F.lit("only_seg").alias("op"), "c_custkey")
    return both.unionByName(only_seg)


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q20_window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice AS total_price,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q20_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER ranking window.

    Scale: Spark inserts a WindowGroupLimit (per-partition top-N pushdown)
    before the shuffle, so only N rows per group per task shuffle.
    """
    t = register(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q21_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
             AS running_spend
    FROM orders
    WHERE o_custkey <= 50
    """,
    tags=("window",),
)
def q21_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — cumulative frame ROWS UNBOUNDED→CURRENT.
    Accumulates exact integer cents so the running value is identical under
    any window-accumulation algorithm either engine uses."""
    t = register(spark, sf_dir, ("orders",))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cents = F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint")
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.sum(cents).over(w) / 100.0).alias("running_spend"),
        )
    )


@query(
    "q22_window_lag_lead",
    oracle=f"""
    SELECT user_id, event_id, ts,
           {sql_iround('value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)', 4)}
             AS delta_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    WHERE user_id <= 20
    """,
    tags=("window", "events"),
)
def q22_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD analytics over the event stream, per user in time order."""
    t = register(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .filter(F.col("user_id") <= 20)
        .select(
            "user_id",
            "event_id",
            "ts",
            iround(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
            F.lead("event_type").over(w).alias("next_type"),
        )
    )


@query(
    "q23_dedup_latest_per_key",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("window", "dedup"),
    bench=True,
)
def q23_dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup — the reference's W1 operator
    (ROW_NUMBER ... ORDER BY load_ds DESC then rn=1,
    `scripts/sql/l2_tables/upsert_l2_for_ds.sql:10-21`), generalized.
    """
    from dibimbing_case_study_etl_spark.operators.dedup_window import latest_per_key

    t = register(spark, sf_dir, ("events",))
    out = latest_per_key(t["events"], keys=["user_id"], order_by=[F.desc("ts"), F.desc("event_id")])
    return out.select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Rollup / cube / pivot
# ---------------------------------------------------------------------------


@query(
    "q16_rollup_region_nation",
    oracle=f"""
    SELECT r_name, n_name, COUNT(c_custkey) AS n_customers,
           {sql_dsum('c_acctbal', 2)} AS total_acctbal
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("rollup",),
)
def q16_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    t = register(spark, sf_dir, ("region", "nation", "customer"))
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("c_custkey").alias("n_customers"),
        dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
    )


@query(
    "q17_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_davg('o_totalprice', 2)} AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube",),
)
def q17_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two categorical dimensions (all 4 grouping sets)."""
    t = register(spark, sf_dir, ("orders",))
    return t["orders"].cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        davg(F.col("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "q24_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) END), 0) / 100.0 AS open_total,
           COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) END), 0) / 100.0 AS finished_total,
           COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) END), 0) / 100.0 AS partial_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def q24_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT orderstatus into columns (Spark .pivot ≡ conditional aggregation),
    summing exact integer cents."""
    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].withColumn(
        "cents", F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint")
    )
    out = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).sum("cents")
    return out.select(
        "o_orderpriority",
        (F.coalesce(F.col("O"), F.lit(0)) / 100.0).alias("open_total"),
        (F.coalesce(F.col("F"), F.lit(0)) / 100.0).alias("finished_total"),
        (F.coalesce(F.col("P"), F.lit(0)) / 100.0).alias("partial_total"),
    )


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY §2.7) + JSON + events time-series
# ---------------------------------------------------------------------------


@query(
    "q25_scalar_functions",
    oracle=f"""
    SELECT o_orderkey,
           UPPER(o_orderstatus)                                        AS up_status,
           SUBSTRING(o_orderpriority, 1, 1)                            AS prio_code,
           CONCAT(o_orderstatus, '-', o_orderpriority)                 AS status_prio,
           CAST(LENGTH(o_orderpriority) AS INTEGER)                    AS prio_len,
           CAST(EXTRACT(year  FROM o_orderdate) AS INTEGER)            AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER)            AS o_month,
           CAST(EXTRACT(day   FROM o_orderdate) AS INTEGER)            AS o_day,
           o_orderdate + INTERVAL 30 DAY                               AS due_ts,
           CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
           {sql_iround('o_totalprice * 0.1', 2)}                       AS fee,
           ABS(o_totalprice - 100000.0)                                AS dist_100k,
           CAST(o_orderkey % 7 AS BIGINT)                              AS key_mod7,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END                                       AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending')             AS status_or_pending
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags=("scalar",),
)
def q25_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math / conditional scalar surface (SURVEY §2.7 F1–F12),
    all JVM-side built-ins inside WholeStageCodegen — no Python UDFs."""
    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("up_status"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        iround(F.col("o_totalprice") * 0.1, 2).alias("fee"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias("status_or_pending"),
    )


@query(
    "q26_events_hourly",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS hour_ts, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 2)} AS total_value,
           {sql_davg('value', 2)} AS avg_value
    FROM events
    GROUP BY hour_ts, event_type
    """,
    tags=("events", "agg"),
    bench=True,
)
def q26_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate over the event stream (batch form of
    the streaming windowed agg in streaming/)."""
    t = register(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
            davg(F.col("value"), 2).alias("avg_value"),
        )
    )


@query(
    "q27_events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("events", "window", "sessionize"),
    bench=True,
)
def q27_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands): lag + gap>30min flag + running sum.

    Scale: one shuffle on user_id serves both windows and the final group-by
    (same partitioning reused across stages).
    """
    t = register(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("is_new"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q28_events_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def q28_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON field extraction (the reference's raw-payload
    access pattern, `scripts/normalize_open_meteo_to_parquet.py:48-50`,
    applied to the events props column)."""
    t = register(spark, sf_dir, ("events",))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )
