"""Fourth relational batch: unpivot/stack, distribution window functions,
multiset set ops, VALUES inline dimensions, and the end-to-end dedup
resolution (cluster → canonical keeper)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries import query


@query(
    "q47_unpivot_stack",
    oracle="""
    WITH per_status AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) / 100.0 AS open_v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) / 100.0 AS finished_v,
             SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) / 100.0 AS partial_v
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, amount FROM (
      SELECT o_orderpriority, 'O' AS status, open_v     AS amount FROM per_status
      UNION ALL
      SELECT o_orderpriority, 'F' AS status, finished_v AS amount FROM per_status
      UNION ALL
      SELECT o_orderpriority, 'P' AS status, partial_v  AS amount FROM per_status
    )
    """,
    tags=("unpivot",),
)
def q47_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via ``stack``: the inverse of q24's PIVOT —
    pivot to per-status columns, then melt back to (priority, status,
    amount) rows."""
    t = register(spark, sf_dir, ("orders",))
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    wide = (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            *[
                (F.sum(F.when(F.col("o_orderstatus") == s, cents).otherwise(F.lit(0))) / 100.0).alias(a)
                for s, a in (("O", "open_v"), ("F", "finished_v"), ("P", "partial_v"))
            ]
        )
    )
    return wide.select(
        "o_orderpriority",
        F.expr("stack(3, 'O', open_v, 'F', finished_v, 'P', partial_v) AS (status, amount)"),
    )


@query(
    "q48_distribution_windows",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           {sql_iround('PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)', 6)} AS pct_rank,
           {sql_iround('CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)', 6)} AS cume,
           CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INTEGER) AS drank
    FROM customer
    """,
    tags=("window", "distribution"),
)
def q48_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / dense_rank
    under a total order (both engines compute (rank-1)/(n-1) and
    rows≤current/n on identical ints — exactly comparable)."""
    t = register(spark, sf_dir, ("customer",))
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        iround(F.percent_rank().over(w), 6).alias("pct_rank"),
        iround(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


@query(
    "q49_multiset_ops",
    oracle="""
    SELECT l_returnflag FROM lineitem WHERE l_quantity >= 48
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem WHERE l_quantity >= 49
    """,
    tags=("setop", "multiset"),
)
def q49_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset semantics: duplicates subtract by count (the
    result keeps one l_returnflag row per quantity-48 line not cancelled by
    a quantity-≥49 line) — a different operator than distinct EXCEPT."""
    t = register(spark, sf_dir, ("lineitem",))
    hi48 = t["lineitem"].filter(F.col("l_quantity") >= 48).select("l_returnflag")
    hi49 = t["lineitem"].filter(F.col("l_quantity") >= 49).select("l_returnflag")
    return hi48.exceptAll(hi49)


@query(
    "q50_values_inline_dim",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0),
             ('mid',   50000.0, 200000.0),
             ('big',   200000.0, 1000000000.0)
    )
    SELECT tier, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
    """,
    tags=("values", "join", "range"),
)
def q50_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension (banding table) range-joined to the fact —
    the standard pattern for threshold tables; the literal dim broadcasts."""
    t = register(spark, sf_dir, ("orders",))
    tiers = t["orders"].sparkSession.createDataFrame(
        [("small", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("big", 200000.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        t["orders"]
        .join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0).alias("total"),
        )
    )
