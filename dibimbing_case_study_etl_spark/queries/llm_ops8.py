"""Round-5 late additions III: recommendation and forecasting analytics.

``r02`` opens the association-rule / market-basket class (support,
co-occurrence, lift — the Apriori first step and the classic
collaborative-filtering prior): no other registry query mines item↔item
structure. ``f01`` opens the forecast-backtest class: a seasonal-naive
baseline scored with WAPE over a holdout window — the accuracy audit
every demand-forecasting deployment publishes before replacing the
baseline with a model.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl,
pandas+Postgres `scripts/`) has neither surface; both belong to the
beyond-reference analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries import query

_R02_MIN_CO = 3  # minimum users co-purchasing a pair (support floor)
_R02_TOPK = 100


@query(
    "r02_item_cooccurrence_lift",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events WHERE event_type = 'purchase'
    ),
    n_users AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM baskets),
    item_n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY item),
    pair_n AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_R02_MIN_CO}
    )
    SELECT item_a, item_b, n_pair,
           {sql_iround("n_pair * u.n / CAST(ia.n_item * ib.n_item AS DOUBLE)", 6)} AS lift,
           {sql_iround("n_pair / CAST(u.n AS DOUBLE)", 6)} AS support
    FROM pair_n
    JOIN item_n ia ON ia.item = item_a
    JOIN item_n ib ON ib.item = item_b
    CROSS JOIN n_users u
    ORDER BY lift DESC, item_a, item_b
    LIMIT {_R02_TOPK}
    """,
    tags=("reco", "events", "json"),
)
def r02_item_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: item pairs ranked by lift
    (P(a,b)/P(a)P(b) over user baskets), with support and the raw
    co-purchase count — the Apriori/association-rule first step and the
    "customers who bought X also bought Y" prior.

    Scale shape: baskets reduce to DISTINCT (user, item) first (a user's
    repeat purchases of one item count once — and the self-join's per-user
    fan-out is then bounded by catalog size, not purchase count); the
    pair join is user-keyed (well-distributed), pair counting is a
    partial-aggregable groupBy with a support floor pruning the long tail
    before ranking; item totals and the user count broadcast back to the
    surviving pairs; final ranking compiles to TakeOrderedAndProject.
    Lift's numerator/denominator are exact BIGINTs, so the 6-dp rounded
    ranking is engine-deterministic (id tiebreaks).
    """
    t = register(spark, sf_dir, ("events",))
    baskets = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .distinct()
    )
    # four consumers (user count, item totals, both sides of the pair
    # join) — materialize once; the joins that need broadcast carry
    # explicit hints, so the checkpoint's stats loss can't demote them
    baskets = baskets.localCheckpoint(eager=True)
    n_users = F.broadcast(baskets.agg(F.countDistinct("user_id").alias("n")))
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _R02_MIN_CO)
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(n_users)
        .select(
            "item_a",
            "item_b",
            "n_pair",
            iround(
                F.col("n_pair") * F.col("n") / (F.col("n_a") * F.col("n_b")).cast("double"), 6
            ).alias("lift"),
            iround(F.col("n_pair") / F.col("n").cast("double"), 6).alias("support"),
        )
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(_R02_TOPK)
    )


_F01_SEASON = 7  # weekly seasonality: forecast(d) = actual(d - 7 days)


@query(
    "f01_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      FROM events
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, d, rev_c,
             LAG(rev_c, {_F01_SEASON}) OVER (PARTITION BY event_type ORDER BY d) AS fc_c
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(rev_c) AS BIGINT) / 100.0 AS actual_total,
           CAST(SUM(ABS(rev_c - fc_c)) AS BIGINT) / 100.0 AS abs_err_total,
           {sql_iround("SUM(ABS(rev_c - fc_c)) / CAST(SUM(rev_c) AS DOUBLE)", 6)} AS wape
    FROM scored
    WHERE fc_c IS NOT NULL
    GROUP BY event_type
    """,
    tags=("forecast", "events", "window"),
)
def f01_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: the seasonal-naive baseline (forecast = the
    value {s} days earlier) scored per event type with WAPE
    (Σ|err| / Σactual) over every day that has a season-lagged
    predecessor. Seasonal-naive is the baseline every forecasting
    deployment must beat, and WAPE the robust accuracy score it reports —
    this query is the whole backtest harness as one plan.

    Scale: the event feed reduces to (type, day) integer-cent totals
    FIRST (partial-aggregable; the only corpus-sized shuffle), so the
    lag window runs over the aggregated table — thousands of rows per
    type even for years of history, never the raw feed. Integer cents
    end to end: lag, error, and WAPE numerator/denominator are exact
    BIGINTs, rounded once at the published score."""
    t = register(spark, sf_dir, ("events",))
    daily = (
        t["events"]
        .groupBy(
            "event_type",
            F.col("ts").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.call_function("rint", F.col("value") * 100).cast("bigint")).alias("rev_c")
        )
    )
    w = W.partitionBy("event_type").orderBy("d")
    scored = daily.withColumn("fc_c", F.lag("rev_c", _F01_SEASON).over(w)).filter(
        F.col("fc_c").isNotNull()
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("rev_c") / F.lit(100.0).cast("double")).alias("actual_total"),
        (F.sum(F.abs(F.col("rev_c") - F.col("fc_c"))) / F.lit(100.0).cast("double")).alias(
            "abs_err_total"
        ),
        iround(
            F.sum(F.abs(F.col("rev_c") - F.col("fc_c"))) / F.sum("rev_c").cast("double"), 6
        ).alias("wape"),
    )
