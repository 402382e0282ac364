"""Sixth relational batch — warehouse-lifecycle analytics: slowly-changing
dimensions, snapshot auditing, and cohort retention. These are the
query shapes a serving warehouse (the reference's Postgres L1/L2 tier,
`scripts/load_parquet_to_postgres_l1.py`) answers after the ETL lands:

- u02: SCD Type-2 dimension build from a change feed — collapse
  consecutive identical attribute values, derive effective-from/to
  validity windows and the current flag. Two windows over one key, no
  joins.
- u03: snapshot diff / audit — latest-state-per-key at two cut points,
  full-outer diffed into added/changed/unchanged/removed. The audit a
  warehouse runs to explain "what changed between yesterday's load and
  today's".
- q71: weekly cohort retention over the events stream — first-seen week
  per user × distinct active weeks → the classic retention triangle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries import query


@query(
    "u02_scd2_dimension",
    oracle="""
    WITH feed AS (
      SELECT o_custkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od, o_orderkey,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, od, o_orderkey
      FROM feed
      WHERE o_orderpriority IS DISTINCT FROM prev
    )
    SELECT o_custkey,
           o_orderpriority,
           od AS eff_from,
           lead(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS eff_to,
           (lead(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) IS NULL)
             AS is_current
    FROM changes
    """,
    tags=("warehouse", "scd2", "window"),
)
def u02_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: treat each order as an
    observation of the customer's priority attribute; keep only rows where
    the attribute CHANGED vs the previous observation (lag, null-safe), then
    derive [eff_from, eff_to) validity windows via lead and flag the open
    row as current. Deterministic under same-day observations via the
    orderkey tiebreak.

    Scale: one shuffle on the dimension key feeds BOTH windows (same
    partitioning, same ordering → a single sort, two window frames over
    it). No join: the change-collapse is lag, not a self-join — at 100 TB
    the change feed streams through one exchange. This is the batch twin
    of the reference's L2 "latest state" upsert, keeping full history
    instead of overwriting (`load_parquet_to_postgres_l1.py:124-149`).
    """
    t = register(spark, sf_dir, ("orders",))
    byk = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    feed = t["orders"].select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("od"),
        "o_orderkey",
    ).withColumn("prev", F.lag("o_orderpriority").over(byk))
    changes = feed.filter(
        ~F.col("o_orderpriority").eqNullSafe(F.col("prev"))
    ).drop("prev")
    lead_od = F.lead("od").over(byk)
    return changes.select(
        "o_custkey",
        "o_orderpriority",
        # DATE outputs cast to timestamp: DuckDB DATE comes back through
        # pandas as midnight timestamps and the value-hash compares types
        F.col("od").cast("timestamp").alias("eff_from"),
        lead_od.cast("timestamp").alias("eff_to"),
        lead_od.isNull().alias("is_current"),
    )


_U03_T1 = "2024-01-15 00:00:00"
_U03_T2 = "2024-01-25 00:00:00"


@query(
    "u03_snapshot_diff",
    oracle=f"""
    WITH old_snap AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_U03_T1}'
      ) WHERE rn = 1
    ),
    new_snap AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_U03_T2}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           {sql_iround("o.value", 2)} AS old_value,
           {sql_iround("n.value", 2)} AS new_value,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                WHEN {sql_iround("o.value", 2)} IS DISTINCT FROM {sql_iround("n.value", 2)}
                  THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
    """,
    tags=("warehouse", "audit", "snapshot"),
)
def u03_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot audit: the latest state per user as of two cut points,
    full-outer diffed into added / changed / unchanged / removed (removed
    cannot occur with T1 < T2 over an append-only feed, but the audit
    contract covers it — a retention sweep between snapshots WOULD produce
    it). This explains a day's warehouse delta row-by-row.

    Scale: BOTH snapshots come out of one scan and one user-keyed
    aggregation — ``max_by(value, (ts, event_id))`` for the new state,
    and the same ``max_by`` with the ordering key nulled out past T1 for
    the old state (max_by skips null keys, so pre-T1 rows alone compete).
    No window, no self-join, no second shuffle: the diff a naive plan
    writes as scan×2 → window×2 → full-outer-join collapses into a single
    partial-aggregable groupBy, which is the only shape that survives a
    100 TB event feed. The T2 filter pushes to the scan (partition
    pruning on a date-partitioned table); T1 rides inside the aggregate.
    """
    t = register(spark, sf_dir, ("events",))
    t1 = F.lit(_U03_T1).cast("timestamp")
    t2 = F.lit(_U03_T2).cast("timestamp")
    pre_t1 = F.col("ts") < t1
    ordkey = F.struct("ts", "event_id")
    agg = (
        t["events"]
        .filter(F.col("ts") < t2)
        .groupBy("user_id")
        .agg(
            F.max_by("value", ordkey).alias("__new_raw"),
            F.max_by(F.col("value"), F.when(pre_t1, ordkey)).alias("__old_raw"),
            F.max(pre_t1).alias("__has_old"),
        )
    )
    old_v = F.when(F.col("__has_old"), iround(F.col("__old_raw"), 2))
    new_v = iround(F.col("__new_raw"), 2)
    return agg.select(
        "user_id",
        old_v.alias("old_value"),
        new_v.alias("new_value"),
        F.when(~F.col("__has_old"), F.lit("added"))
        .when(F.col("__new_raw").isNull(), F.lit("removed"))  # contract row; unreachable with T1<T2 append-only
        .when(~old_v.eqNullSafe(new_v), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


@query(
    "q71_cohort_retention",
    oracle="""
    WITH weeks AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    cohort AS (
      SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id
    )
    SELECT cohort.cohort_week,
           CAST(datediff('day', cohort.cohort_week, weeks.wk) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_users
    FROM weeks JOIN cohort USING (user_id)
    GROUP BY cohort.cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("analytics", "retention", "window"),
)
def q71_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by their
    first-seen ISO week; each (cohort_week, week_offset) cell counts users
    from that cohort active in that later week. Offsets are exact —
    both engines truncate weeks to Monday, so the day difference is always
    a multiple of 7.

    Scale: the distinct (user, week) reduction happens FIRST (partial-agg
    combine crushes the raw event volume map-side — events per user-week
    collapse before any shuffle); the cohort min is a second partial agg
    over that already-small set, and the final join is user-keyed on data
    two aggregations smaller than the input. No window functions at all —
    retention is pure groupBy algebra.
    """
    t = register(spark, sf_dir, ("events",))
    weeks = (
        t["events"]
        .select("user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk"))
        .distinct()
    )
    cohort = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("timestamp").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q72_revenue_pareto",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(cents) AS tot FROM rev),
    c AS (
      SELECT o_custkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    )
    SELECT o_custkey,
           (cents / 100.0) AS revenue,
           {sql_iround("CAST(cum AS DOUBLE) / tot", 6)} AS cum_share,
           (cum * 5 <= tot) AS in_top_20pct_revenue
    FROM c CROSS JOIN tot
    """,
    tags=("analytics", "pareto", "prefix-sum"),
)
def q72_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto) report: customers ranked by lifetime
    revenue, each carrying its cumulative share of total revenue and a
    flag for the head that makes up the first 20% of revenue. Revenue is
    exact integer cents, so the running sum and the 20% cut are
    arbitrary-order-safe and engine-exact (the flag compares cum*5 ≤ tot
    in integers — no float boundary).

    Scale: the naive SQL shape is a GLOBAL ordered window — a
    single-partition sort that cannot run at 100 TB. This builder reuses
    :func:`~..operators.packing.prefix_sum` (range-bucketed distributed
    cumsum; driver state = one offset per bucket) over the aggregated
    customer table, so the only full shuffle is the groupBy on custkey.
    The oracle keeps the window formulation — same math, different
    physical shape.
    """
    from dibimbing_case_study_etl_spark.operators.packing import prefix_sum

    t = register(spark, sf_dir, ("orders",))
    rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint"))
            .alias("cents")
        )
        # descending revenue as an ASCENDING total order for the range-
        # bucketed prefix sum (first order col doubles as the bucket key)
        .withColumn("neg_cents", -F.col("cents"))
    )
    c = prefix_sum(rev, "cents", ["neg_cents", "o_custkey"], out_col="cum")
    tot = rev.agg(F.sum("cents").alias("tot"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            (F.col("cents") / 100.0).alias("revenue"),
            iround(F.col("cum").cast("double") / F.col("tot"), 6).alias("cum_share"),
            (F.col("cum") * 5 <= F.col("tot")).alias("in_top_20pct_revenue"),
        )
    )


_U04_T1 = "2024-01-15 00:00:00"
_U04_T2 = "2024-01-25 00:00:00"


@query(
    "u04_cdc_apply",
    oracle=f"""
    WITH base AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{_U04_T1}'
      ) WHERE rn = 1
    ),
    last_chg AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{_U04_T1}' AND ts < TIMESTAMP '{_U04_T2}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, c.user_id) AS user_id,
           {sql_iround("CASE WHEN c.user_id IS NOT NULL THEN c.value ELSE b.value END", 2)}
             AS final_value,
           CASE WHEN c.user_id IS NOT NULL THEN 'updated' ELSE 'base' END AS provenance
    FROM base b FULL OUTER JOIN last_chg c ON b.user_id = c.user_id
    WHERE NOT (c.user_id IS NOT NULL AND c.event_type = 'error')
    """,
    tags=("warehouse", "cdc", "merge"),
)
def u04_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with DELETE tombstones — the merge surface the
    reference's ON CONFLICT upsert lacks: a change feed (events in
    [T1, T2), per-user ordered) folds onto the T1 base snapshot where the
    LAST change wins — an ``error`` tombstone deletes the key (unless a
    later upsert resurrects it), any other change upserts its value, and
    untouched base keys survive as ``provenance='base'``.

    Scale: like u03, the textbook shape (two snapshots + full-outer join)
    collapses into ONE user-keyed aggregation over one scan — base state,
    last change, and tombstone flag all come from conditional ``max_by``
    in the same partial-aggregable groupBy. The oracle keeps the
    window+join formulation; same math, three shuffles fewer.
    """
    t = register(spark, sf_dir, ("events",))
    t1 = F.lit(_U04_T1).cast("timestamp")
    t2 = F.lit(_U04_T2).cast("timestamp")
    pre = F.col("ts") < t1
    chg = F.col("ts") >= t1
    ordkey = F.struct("ts", "event_id")
    agg = (
        t["events"]
        .filter(F.col("ts") < t2)
        .groupBy("user_id")
        .agg(
            F.max_by(F.col("value"), F.when(pre, ordkey)).alias("__base_val"),
            F.max(pre).alias("__has_base"),
            F.max_by(
                F.struct(F.col("event_type"), F.col("value")), F.when(chg, ordkey)
            ).alias("__last_chg"),
            F.max(chg).alias("__has_chg"),
        )
    )
    deleted = F.col("__has_chg") & (F.col("__last_chg.event_type") == "error")
    return (
        agg.filter(~deleted)
        .select(
            "user_id",
            iround(
                F.when(F.col("__has_chg"), F.col("__last_chg.value")).otherwise(
                    F.col("__base_val")
                ),
                2,
            ).alias("final_value"),
            F.when(F.col("__has_chg"), F.lit("updated"))
            .otherwise(F.lit("base"))
            .alias("provenance"),
        )
    )


@query(
    "q73_integrity_audit",
    oracle="""
    SELECT 'orphaned_lineitems' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'childless_orders',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
    UNION ALL
    SELECT 'nonpositive_quantity',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'order_before_1990',
           (SELECT COUNT(*) FROM orders WHERE o_orderdate < TIMESTAMP '1990-01-01')
    ORDER BY check_name
    """,
    tags=("warehouse", "quality", "integrity"),
)
def q73_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the fact tables — the relational
    complement to operators/quality.py's column checks: orphaned
    lineitems (FK without parent), childless orders, non-positive
    quantities, and out-of-domain dates, each as a named violation count.
    Zero counts are part of the contract: the audit proves integrity, it
    doesn't just find breakage.

    Scale: the two FK checks are anti joins on the order key (AQE plans
    them like any fact join — broadcast or shuffle by observed size); the
    domain checks are pushed-down scans. Each arm reduces to ONE row
    before the lazy union, so all four checks run in a single job with a
    metadata-sized result — no driver-side counting loop.
    """
    t = register(spark, sf_dir, ("orders", "lineitem"))
    li, o = t["lineitem"], t["orders"]

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    return (
        check("orphaned_lineitems",
              li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"))
        .unionByName(check("childless_orders",
              o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti")))
        .unionByName(check("nonpositive_quantity",
              li.filter(F.col("l_quantity") <= 0)))
        .unionByName(check("order_before_1990",
              o.filter(F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))))
        .orderBy("check_name")
    )


# --- q74: marketing attribution (first-touch / last-touch) ----------------

_Q74_BODY = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             FIRST_VALUE({ft}) OVER w AS first_touch,
             LAST_VALUE({lt})  OVER w AS last_touch
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (SELECT * FROM tagged WHERE event_type = 'purchase')
    SELECT 'first_touch' AS model, first_touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST({rnd} AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM p WHERE first_touch IS NOT NULL GROUP BY first_touch
    UNION ALL
    SELECT 'last_touch' AS model, last_touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST({rnd} AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM p WHERE last_touch IS NOT NULL GROUP BY last_touch
"""


_Q74_SPARK = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             FIRST_VALUE(touch) IGNORE NULLS OVER w AS first_touch,
             LAST_VALUE(touch)  IGNORE NULLS OVER w AS last_touch
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (SELECT * FROM tagged WHERE event_type = 'purchase')
    SELECT 'first_touch' AS model, first_touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(rint(value * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
    FROM p WHERE first_touch IS NOT NULL GROUP BY first_touch
    UNION ALL
    SELECT 'last_touch' AS model, last_touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(rint(value * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
    FROM p WHERE last_touch IS NOT NULL GROUP BY last_touch
"""


@query(
    "q74_attribution_models",
    oracle=_Q74_BODY.format(
        ft="touch IGNORE NULLS",
        lt="touch IGNORE NULLS",
        rnd="round_even(value * 100, 0)",
    ),
    tags=("window", "events", "sql-entry"),
)
def q74_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch revenue attribution: every purchase's
    value is credited to the user's earliest (first-touch) and most recent
    (last-touch) preceding marketing touch (click/view), then rolled up by
    model × touch type — the two bookend models of marketing analytics,
    computed side by side for comparison.

    Scale: NO purchase⋈touch join — the classic formulation joins each
    purchase to the user's touch history with a range predicate
    (touches × purchases blowup on active users); here one per-user window
    (ORDER BY ts, event_id / UNBOUNDED PRECEDING..1 PRECEDING with IGNORE
    NULLS) carries both attributions along the stream, so cost is one
    user-keyed exchange over events regardless of per-user activity. The
    revenue roll-up is a ≤|touch types|·2-row aggregate via scaled-integer
    sums (order-independent)."""
    register(spark, sf_dir, ("events",))
    return spark.sql(_Q74_SPARK)




# --- u05: bitemporal as-of audit ------------------------------------------

# Valid-time cut V0 and transaction-time cut T0. Each order is a version
# record for its customer that becomes VALID at o_orderdate but is only
# RECORDED (transaction time) o_orderkey % 7 days later — deterministic
# late arrival. T0 sits 2 days after V0, so versions valid before the cut
# but recorded after it exist: exactly the records a bitemporal audit is
# for.
_U05_V0 = "1997-06-30"
_U05_T0 = "1997-07-02"


@query(
    "u05_bitemporal_asof",
    oracle=f"""
    WITH v AS (
      SELECT o_custkey,
             o_orderkey,
             CAST(o_orderdate AS DATE) AS od,
             CAST(o_orderdate AS DATE) + (o_orderkey % 7) * INTERVAL 1 DAY AS txn,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               * 10000000000 + o_orderkey AS ordkey
      FROM orders
      WHERE CAST(o_orderdate AS DATE) <= DATE '{_U05_V0}'
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(CASE WHEN txn <= DATE '{_U05_T0}' THEN 1 END) AS BIGINT)
             AS n_known_then,
           arg_max(o_orderkey, ordkey)
             FILTER (WHERE txn <= DATE '{_U05_T0}') AS then_orderkey,
           arg_max(o_orderkey, ordkey) AS now_orderkey,
           COALESCE(arg_max(o_orderkey, ordkey)
                      FILTER (WHERE txn <= DATE '{_U05_T0}'), -1)
             <> arg_max(o_orderkey, ordkey) AS revised
    FROM v
    GROUP BY o_custkey
    """,
    tags=("warehouse", "bitemporal", "agg"),
)
def u05_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of audit: per customer, the latest version VALID at
    V0 *as the warehouse knew it* at transaction-time T0 vs as it knows it
    now — flagging keys whose history was REVISED by late-arriving records
    (valid before the cut, recorded after it). Valid time and transaction
    time are independent axes; u02/u03/u04 each handle one, this is the
    two-axis query a regulated warehouse answers for "what did we report
    and why did it change".

    Scale: the u03/u04 lesson applied — both temporal reconstructions come
    from ONE partial-aggregable groupBy: `max_by(key, (od, ok))`
    unconditionally for the now-state, the same max_by with the ordering
    key nulled past T0 for the then-state (max_by skips null keys). The
    valid-time cut pushes to the scan; no window, no self-join, no second
    shuffle over a 100 TB version feed."""
    t = register(spark, sf_dir, ("orders",))
    od = F.col("o_orderdate").cast("date")
    v = (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            od.alias("od"),
            F.date_add(od, (F.col("o_orderkey") % 7).cast("int")).alias("txn"),
        )
        .filter(F.col("od") <= F.lit(_U05_V0).cast("date"))
    )
    known_then = F.col("txn") <= F.lit(_U05_T0).cast("date")
    # composite BIGINT ordering key (epoch-day * 1e10 + orderkey): max_by
    # over a struct is Spark-only — DuckDB's arg_max needs a scalar
    ordkey = (
        F.datediff(F.col("od"), F.lit("1970-01-01").cast("date")).cast("long")
        * 10_000_000_000
        + F.col("o_orderkey")
    )
    then_key = F.max_by("o_orderkey", F.when(known_then, ordkey))
    now_key = F.max_by("o_orderkey", ordkey)
    return v.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(known_then.cast("bigint")).alias("n_known_then"),
        then_key.alias("then_orderkey"),
        now_key.alias("now_orderkey"),
        (F.coalesce(then_key, F.lit(-1)) != now_key).alias("revised"),
    )


# --- q75: position-based (U-shaped) multi-touch attribution ---------------

_Q75_SPARK_RND = "rint({x} * 10000)"
_Q75_DUCK_RND = "round_even({x} * 10000, 0)"


def _q75_body(rnd: str) -> str:
    # credit share per touch type, computed IN-ROW per purchase from the
    # bookend types and running per-type counts — no touch explode:
    #   n = 1  -> 1.0 to the only touch
    #   n = 2  -> 0.5 / 0.5 to first and last
    #   n >= 3 -> 0.4 first + 0.4 last + 0.2 split over the middles
    # credit = num/den as EXACT BIGINT fractions (n=1 -> [f]/1; n=2 ->
    # ([f]+[l])/2; n>=3 -> (4(n-2)([f]+[l]) + 2·middles) / (10(n-2))):
    # the only float ops are value * num / den, which both engines
    # evaluate identically — decimal literals like 0.4 would run DECIMAL
    # intermediates with engine-specific precision and drift the hash
    credit_num = """
        CASE WHEN n_t = 1 THEN (CASE WHEN first_touch = '{ty}' THEN 1 ELSE 0 END)
             WHEN n_t = 2 THEN
               (CASE WHEN first_touch = '{ty}' THEN 1 ELSE 0 END)
               + (CASE WHEN last_touch = '{ty}' THEN 1 ELSE 0 END)
             ELSE
               4 * (n_t - 2) * ((CASE WHEN first_touch = '{ty}' THEN 1 ELSE 0 END)
                                + (CASE WHEN last_touch = '{ty}' THEN 1 ELSE 0 END))
               + 2 * (n_{ty}
                      - (CASE WHEN first_touch = '{ty}' THEN 1 ELSE 0 END)
                      - (CASE WHEN last_touch = '{ty}' THEN 1 ELSE 0 END))
        END"""
    credit_den = "CASE WHEN n_t = 1 THEN 1 WHEN n_t = 2 THEN 2 ELSE 10 * (n_t - 2) END"
    c_click = f"({credit_num.format(ty='click')}) / CAST(({credit_den}) AS DOUBLE)"
    c_view = f"({credit_num.format(ty='view')}) / CAST(({credit_den}) AS DOUBLE)"
    return f"""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             {{fv}} OVER w AS first_touch,
             {{lv}} OVER w AS last_touch,
             SUM(CASE WHEN touch IS NOT NULL THEN 1 ELSE 0 END) OVER w AS n_t,
             SUM(CASE WHEN touch = 'click' THEN 1 ELSE 0 END) OVER w AS n_click,
             SUM(CASE WHEN touch = 'view' THEN 1 ELSE 0 END) OVER w AS n_view
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
      SELECT value, first_touch, last_touch, n_t, n_click, n_view
      FROM tagged WHERE event_type = 'purchase' AND n_t >= 1
    ),
    credited AS (
      SELECT CAST({rnd.format(x=f"value * ({c_click})")} AS BIGINT) AS click_c,
             CAST({rnd.format(x=f"value * ({c_view})")} AS BIGINT) AS view_c
      FROM p
    )
    SELECT 'position_based' AS model, 'click' AS touch_type,
           CAST(SUM(CASE WHEN click_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(SUM(click_c) AS BIGINT) / CAST(10000 AS DOUBLE) AS revenue
    FROM credited
    UNION ALL
    SELECT 'position_based' AS model, 'view' AS touch_type,
           CAST(SUM(CASE WHEN view_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(SUM(view_c) AS BIGINT) / CAST(10000 AS DOUBLE) AS revenue
    FROM credited
    """


@query(
    "q75_position_attribution",
    oracle=_q75_body(_Q75_DUCK_RND).format(
        fv="FIRST_VALUE(touch IGNORE NULLS)", lv="LAST_VALUE(touch IGNORE NULLS)"
    ),
    tags=("window", "events", "sql-entry"),
)
def q75_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase's
    value splits 40% / 20% / 40% across the user's first touch, middle
    touches (shared evenly), and last touch — the multi-touch model
    between q74's two single-touch bookends. Degenerate paths follow the
    published convention (one touch takes 100%, two touches split 50/50).

    Scale: the whole credit computation is IN-ROW per purchase — bookend
    types via IGNORE-NULLS windows plus per-type running counts over the
    same frame give exact middle-touch counts with NO touch explode and
    NO purchase⋈touch join; per-type credits round to scaled BIGINT
    before the order-independent roll-up. One user-keyed exchange over
    events, then a 2-row aggregate."""
    register(spark, sf_dir, ("events",))
    return spark.sql(
        _q75_body(_Q75_SPARK_RND).format(
            fv="FIRST_VALUE(touch) IGNORE NULLS", lv="LAST_VALUE(touch) IGNORE NULLS"
        )
    )


# --- q76: frequent path mining over the event stream ----------------------

_Q76_STEPS = 3
_Q76_TOPK = 25

_Q76_BODY = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS step2,
             LEAD(event_type, 2) OVER w AS step3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || ' > ' || step2 || ' > ' || step3 AS path
      FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM paths
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT {topk}
""".format(topk=_Q76_TOPK)


@query(
    "q76_frequent_event_paths",
    oracle=_Q76_BODY,
    tags=("window", "events", "paths", "sql-entry"),
)
def q76_frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent path mining: the top {k} three-step event-type sequences
    users actually take, in event-time order — the product-analytics
    "path analysis" view (q61 checks ONE prescribed funnel; this
    discovers which paths dominate). Identical SQL text runs on both
    engines.

    Scale: consecutive steps come from LEAD windows over the per-user
    stream (one user-keyed exchange — no self-join chain, which would
    shuffle the feed once per step); the path space is |event_types|³
    (tiny), so the count aggregate combines map-side into almost nothing,
    and the final ranking is TakeOrderedAndProject."""
    register(spark, sf_dir, ("events",))
    return spark.sql(_Q76_BODY)
