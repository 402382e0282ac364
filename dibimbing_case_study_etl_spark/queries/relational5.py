"""Fifth relational batch — the remaining classic TPC-H shapes the registry
had not yet covered:

- q62: fraction-of-global-total HAVING threshold (TPC-H Q11 shape)
- q63: per-group COUNT DISTINCT with a NOT-IN supplier blocklist (Q16 shape)
- q64: semi-join on a nested aggregate-over-aggregate threshold (Q20 shape)
- q65: ratio-to-report window (share of group total) + top-N per group

All float aggregation goes through the rint/round_even scaled-integer
helpers (functions/oracle_safe.py) so every comparison boundary and every
emitted value is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    dsum,
    iround,
    sql_dsum,
    sql_iround,
)
from dibimbing_case_study_etl_spark.queries import query


@query(
    "q62_important_part_values",
    oracle=f"""
    WITH vals AS (
      SELECT l_partkey, {sql_dsum("l_extendedprice", 2)} AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM vals
    WHERE part_value > 0.0005 * (SELECT SUM(part_value) FROM vals)
    """,
    tags=("agg", "subquery", "having"),
)
def q62_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose value (shipped by one nation's
    suppliers) exceeds a fraction of the global total — a grouped
    aggregate consumed twice, once per group and once as a scalar.

    Scale: nation broadcasts into supplier; the supplier path is
    SF-proportional so its fact join carries no hint. The per-part values
    are exact cent integers (order-independent), the global total sums
    those exact doubles (each a multiple of 0.01 well inside 2^53 — exact
    in any order), and the threshold multiply runs on bit-identical
    doubles on both engines, so membership at the boundary cannot diverge.
    """
    t = register(spark, sf_dir, ("lineitem", "supplier", "nation"))
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    vals = (
        t["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice"), 2).alias("part_value"))
    )
    total = vals.agg(F.sum("part_value").alias("__total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.0005 * F.col("__total"))
        .select("l_partkey", "part_value")
    )


@query(
    "q63_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("agg", "distinct", "anti"),
)
def q63_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT-IN supplier blocklist.

    The blocklist key (s_suppkey) is non-null by schema, so NOT IN plans
    as a plain left-anti join (the null-aware variant is covered by q41).
    Scale: part filters push to the scan; the anti join's blocklist side
    is SF-proportional → no hint, AQE decides; COUNT DISTINCT expands to
    a two-stage aggregate keyed by the small grouping tuple.
    """
    t = register(spark, sf_dir, ("part", "lineitem", "supplier"))
    banned = t["supplier"].filter(F.col("s_name").like("%7")).select("s_suppkey")
    pp = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24)
    )
    return (
        t["lineitem"]
        .join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .join(banned, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "q64_heavy_widget_suppliers",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey, {sql_dsum("l_quantity", 0)} AS qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%widget%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, qty
    FROM supplier
    JOIN shipped ON l_suppkey = s_suppkey
    WHERE qty > (SELECT 0.5 * AVG(qty) FROM shipped)
    """,
    tags=("join", "subquery", "semi"),
)
def q64_heavy_widget_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped widget quantity in a year
    beats a threshold derived from a second aggregation over the same
    aggregate (half the mean per-supplier quantity) — nested
    aggregate-over-aggregate feeding a semi/inner join back to the dim.

    Determinism: per-supplier quantities are exact integer-valued doubles
    (scale-0 scaled-integer sums), their AVG sums integers inside 2^53 —
    exact in any accumulation order — and the comparison boundary is one
    multiply of bit-identical doubles on both engines.
    """
    t = register(spark, sf_dir, ("lineitem", "part", "supplier"))
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(widget, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), 0).alias("qty"))
    )
    thresh = shipped.agg((0.5 * F.avg("qty")).alias("__half_avg"))
    return (
        t["supplier"]
        .join(shipped, F.col("l_suppkey") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("__half_avg"))
        .select("s_suppkey", "s_name", "qty")
    )


@query(
    "q65_nation_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT n_name,
             c_custkey,
             SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
      FROM customer
      JOIN nation ON n_nationkey = c_nationkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY n_name, c_custkey
    ),
    shared AS (
      SELECT n_name, c_custkey,
             rev_c / 100.0 AS revenue,
             {sql_iround("rev_c / CAST(SUM(rev_c) OVER (PARTITION BY n_name) AS DOUBLE)", 6)}
               AS nation_share,
             ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY rev_c DESC, c_custkey
             ) AS rn
      FROM rev
    )
    SELECT n_name, c_custkey, revenue, nation_share
    FROM shared WHERE rn <= 3
    """,
    tags=("window", "agg", "topk"),
)
def q65_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their nation's revenue,
    top-3 customers per nation — aggregate → ratio-to-group-total window →
    per-group top-N, all over ONE partitioning (nation), so the window
    and the rank reuse a single shuffle/sort.

    Determinism: numerator and denominator are exact BIGINT cents (the
    window SUM is integer), the share divides bit-identical values, and
    the rank has a total tiebreak. The rn<=3 filter plans as
    WindowGroupLimit — map-side top-3 per nation before the shuffle.
    """
    t = register(spark, sf_dir, ("customer", "nation", "orders"))
    rev = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name", "c_custkey")
        .agg(
            F.sum(F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_c"
            )
        )
    )
    w_total = W.partitionBy("n_name")
    w_rank = W.partitionBy("n_name").orderBy(F.desc("rev_c"), F.asc("c_custkey"))
    return (
        rev.select(
            "n_name",
            "c_custkey",
            (F.col("rev_c") / 100.0).alias("revenue"),
            iround(
                F.col("rev_c") / F.sum("rev_c").over(w_total).cast("double"), 6
            ).alias("nation_share"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q66_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey AS p_partkey, s_name, n_name, s_acctbal,
             MIN({sql_iround('l_extendedprice / l_quantity', 2)}) AS unit_cost
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE' AND p_size <= 25 AND p_type LIKE '%O%'
      GROUP BY 1, 2, 3, 4
    ),
    best AS (SELECT p_partkey, MIN(unit_cost) AS best_cost FROM cost GROUP BY 1)
    SELECT c.p_partkey, s_name, n_name, s_acctbal, unit_cost
    FROM cost c
    JOIN best b ON c.p_partkey = b.p_partkey AND c.unit_cost = b.best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, c.p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "topk"),
)
def q66_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the last of the 22 classic shapes: for each part
    in a size/type slice, every EUROPE supplier offering it at the minimum
    observed unit cost (min l_extendedprice/l_quantity stands in for
    ps_supplycost; the dataset has no partsupp table), richest suppliers
    first. The correlated MIN subquery decorrelates into a per-part
    aggregate joined back on (partkey, cost) equality — written that way
    directly, which is exactly what Catalyst's RewriteCorrelatedScalarQuery
    would produce from the SQL form.

    Scale: nation/region broadcast (fixed-size dims — hints appropriate);
    part and supplier are SF-proportional so their joins carry NO hint
    (AQE broadcasts at bench SF, falls back to shuffle at cluster scale).
    The per-(part, supplier) aggregate and the per-part min reuse the same
    partkey-keyed shuffle. Unit costs round half-even to exact cent
    doubles before MIN, so the equality join back cannot diverge between
    engines; the final ORDER BY is a total order (s_name unique per
    supplier, partkey breaks same-supplier ties) under
    TakeOrderedAndProject.
    """
    t = register(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    eur_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t["part"].filter((F.col("p_size") <= 25) & F.col("p_type").like("%O%"))
    cost = (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_name", "n_name", "s_acctbal")
        .agg(
            F.min(iround(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias("unit_cost")
        )
    )
    best = cost.groupBy(F.col("p_partkey").alias("bk")).agg(F.min("unit_cost").alias("best_cost"))
    return (
        cost.join(
            best,
            (F.col("p_partkey") == F.col("bk")) & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q67_lateral_topk_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) t
    """,
    tags=("join", "lateral", "sql-entry"),
)
def q67_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — each
    customer's three largest orders, through the engine's SQL entry point.

    Scale: Catalyst rewrites the correlated LATERAL-LIMIT into a
    WindowGroupLimit (partial before the shuffle, final after) joined back
    to customer — no per-customer re-execution and no full sort: the
    executed plan prunes every group to ≤3 rows map-side, so the custkey
    shuffle carries at most 3 rows per customer regardless of order count.
    The tiebreak on o_orderkey makes the limit a total order, so the row
    set is engine-independent.
    """
    register(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) t
        """
    )


@query(
    "u01_incremental_rollup",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n_events,
           (SUM(CAST(round_even(value * 100, 0) AS BIGINT)) / 100.0) AS sum_value,
           (SUM(CAST(round_even(value * 100, 0) AS BIGINT)) / 100.0 / COUNT(*))
             AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("rollup", "incremental", "maintenance"),
)
def u01_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance (hypertable continuous-aggregate
    pattern): the events table arrives as THREE separate loads, each
    merged into a persistent per-(day, event_type) aggregate table via
    partial-aggregate algebra (`operators/rollup.py`) — and the final
    state must equal the one-shot GROUP BY over all history, which is
    exactly what the oracle computes. Proves count/scaled-int-sum/min/max
    merge bit-identically regardless of how the data was batched.

    Scale: each load shuffles one partial row per touched group (map-side
    combine first), reads back only the touched day partitions, and
    rewrites only those (dynamic partition overwrite) — O(day) per daily
    load, never O(history).
    """
    import tempfile

    from dibimbing_case_study_etl_spark.operators.rollup import merge_rollup, read_rollup

    t = register(spark, sf_dir, ("events",))
    ev = t["events"].withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    state = tempfile.mkdtemp(prefix="spark_graft_rollup_") + "/state"
    for i in range(3):
        merge_rollup(
            spark,
            state,
            ev.filter(F.col("event_id") % 3 == i),
            "day",
            ["event_type"],
            "value",
        )
    return read_rollup(spark, state, "day", ["event_type"])


@query(
    "q68_session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("events", "window", "sessionize"),
)
def q68_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE ``session_window`` aggregate
    (the q27 gaps-and-islands twin): events within a 30-minute gap merge
    into one session per user; the window's end is last-event + gap
    (half-open, so an event landing exactly at the boundary starts a new
    session — mirrored by the oracle's ``>=`` flag).

    Scale: session_window is a first-class aggregate — one shuffle on
    user_id, sessions merged inside the aggregation operator with no lag/
    running-sum window pass, and the SAME operator runs in Structured
    Streaming with watermark-based state eviction (`streaming/
    events_stream.py`) — the batch/stream-unified path q27's manual
    windows cannot take.
    """
    t = register(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q69_sql_udf_discount",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           (SUM(CAST(round_even(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
             / 100.0) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "sql-entry"),
)
def q69_sql_udf_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION … RETURN``):
    the discount-price expression lives as a catalog UDF and the query
    calls it like a built-in — the engine's answer to warehouse-style SQL
    macros, with none of a Python UDF's serialization cost (the body
    inlines into the plan and stays inside whole-stage codegen; the
    oracle inlines the same expression by hand).
    """
    register(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               SUM(CAST(rint(disc_price(l_extendedprice, l_discount) * 100) AS BIGINT))
                 / CAST(100 AS DOUBLE) AS disc_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "q70_error_tolerant_parse",
    oracle="""
    WITH parsed AS (
      SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             value
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_unparsed,
           COUNT(CASE WHEN k = 5 THEN 1 END) AS n_div_zero,
           (SUM(CASE WHEN k IS NOT NULL AND k <> 5
                     THEN CAST(round_even(value / (k - 5) * 10000, 0) AS BIGINT)
                END) / 10000.0) AS sum_ratio
    FROM parsed
    GROUP BY event_type
    """,
    tags=("scalar", "error-handling"),
)
def q70_error_tolerant_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant ingestion semantics: ``try_cast`` absorbs malformed
    values and ``try_divide`` turns division-by-zero into NULL instead of
    a job-killing ANSI exception — the per-row failure-isolation a dirty
    100 TB feed needs (one bad record must never fail a 1000-executor
    stage). The oracle mirrors NULL-on-error with explicit CASE guards.
    """
    t = register(spark, sf_dir, ("events",))
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    ratio = F.try_divide(F.col("value"), k - F.lit(5))
    return (
        t["events"]
        .select("event_type", k.alias("k"), ratio.alias("ratio"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
            F.count(F.when(F.col("k") == 5, 1)).alias("n_div_zero"),
            (
                F.sum(
                    F.call_function("rint", F.col("ratio") * 10000).cast("bigint")
                )
                / 10000.0
            ).alias("sum_ratio"),
        )
    )
