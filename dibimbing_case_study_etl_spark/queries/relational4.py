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
             SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) / 100.0 AS open_v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) / 100.0 AS finished_v,
             SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round_even(o_totalprice * 100, 0) AS BIGINT) ELSE 0 END) / 100.0 AS partial_v
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
    cents = F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint")
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
           SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total
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
            (
                F.sum(F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint")) / 100.0
            ).alias("total"),
        )
    )


@query(
    "q51_python_udtf_sentences",
    oracle="""
    WITH exploded AS (
      SELECT doc_id, i,
             TRIM(string_split(text, '.')[i], ' ') AS sentence
      FROM documents,
           LATERAL (SELECT UNNEST(generate_series(1, len(string_split(text, '.')))) AS i)
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS pos,
           sentence
    FROM exploded
    WHERE sentence <> ''
    """,
    tags=("udtf", "lateral", "text"),
)
def q51_python_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) splitting documents into positioned
    sentences, consumed through a SQL LATERAL join — the user-defined
    *table* half of the UDF surface (q45/q46 cover scalar + grouped).

    ``useArrow=True`` moves the row transfer onto Arrow record batches
    (the pickle row loop is the default); since a table function can't be
    expressed as a scalar expression, this is the idiomatic Spark shape for
    "one row in, N typed rows out" transformations."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos bigint, sentence string", useArrow=True)
    class SplitSentences:
        def eval(self, doc_id, text):
            pos = 0
            for part in (text or "").split("."):
                stripped = part.strip(" ")
                if stripped:
                    pos += 1
                    yield doc_id, pos, stripped

    register(spark, sf_dir, ("documents",))
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        "SELECT s.doc_id, s.pos, s.sentence "
        "FROM documents d, LATERAL split_sentences(d.doc_id, d.text) s"
    )


@query(
    "q52_stateful_running_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           SUM(CAST(round_even(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("stateful", "streaming-twin", "pandas"),
)
def q52_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``applyInPandasWithState`` operator (streaming/stateful.py)
    driven over the events table as an availableNow stream into a memory
    sink: the final cumulative emission per user must equal the plain
    grouped aggregate. The oracle proves the custom stateful operator's
    end-to-end arithmetic; the streaming test additionally proves state
    carry-over across micro-batches."""
    import tempfile

    from dibimbing_case_study_etl_spark.catalog import load_table
    from dibimbing_case_study_etl_spark.streaming.events_stream import EVENTS_SCHEMA
    from dibimbing_case_study_etl_spark.streaming.stateful import user_running_totals

    from dibimbing_case_study_etl_spark.streaming import scaled_state_partitions

    tmp = tempfile.mkdtemp(prefix="q52_stateful_")
    src = f"{tmp}/events"
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    # state shards sized to the input, not the core count (see
    # streaming.stream_state_partitions)
    with scaled_state_partitions(spark, events):
        q = (
            user_running_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("q52_running_totals")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # cumulative emissions: the max-n_events row per user is the final one
    got = spark.table("q52_running_totals")
    return (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )


_Q53_SQL = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1992-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '1998-12-01 00:00:00'
    ),
    monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS cnt
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT m AS month_start, COALESCE(cnt, 0) AS n_orders
    FROM months LEFT JOIN monthly ON mo = m
"""


@query(
    "q53_recursive_month_spine",
    oracle=_Q53_SQL,
    tags=("recursive-cte", "spine", "sql"),
)
def q53_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) building a month spine and
    gap-filling monthly order counts — the standard calendar-completion
    pattern; the recursion is driver-light (84 spine rows), the monthly
    aggregate is one shuffled groupBy, and the spine side broadcasts. The
    SQL text is engine-portable: the oracle runs the identical query."""
    register(spark, sf_dir, ("orders",))
    return spark.sql(_Q53_SQL)


_Q54_SPARK_SQL = """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_1h,
           SUM(CAST(rint(value * 100) AS BIGINT)) OVER w / CAST(100 AS DOUBLE) AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@query(
    "q54_window_interval_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_1h,
           SUM(CAST(round_even(value * 100, 0) AS BIGINT)) OVER w / 100.0 AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "sql-entry"),
)
def q54_window_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, how many events (and how much
    value) landed in the trailing hour of *event time* — a frame defined by
    a time interval, not a row count, so it is insensitive to row density
    and includes ties (RANGE peers) identically on both engines. One
    shuffle on user_id; the frame scan is a single ordered pass per
    partition. Trailing sums use the scaled-integer rint/round_even pair so
    the doubles hash identically."""
    register(spark, sf_dir, ("events",))
    return spark.sql(_Q54_SPARK_SQL)


@query(
    "q55_cogrouped_order_reconciliation",
    oracle="""
    SELECT o_orderkey,
           COUNT(l_orderkey) AS n_items,
           CAST(COALESCE(SUM(CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)), 0)
                AS BIGINT) AS lineitem_cents
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
    GROUP BY o_orderkey
    """,
    tags=("cogroup", "pandas", "udf"),
)
def q55_cogrouped_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped ``applyInPandas`` — the two-table half of the pandas UDF
    surface (q46 covers one table): orders and lineitem are each shuffled
    once on a shared key, and the Python function sees the pair of aligned
    pandas frames per key and reconciles orders against their items.

    The cogroup KEY is a hash bucket of the order key, not the order key
    itself: cogroup invokes Python once per key, so keying by o_orderkey
    costs O(orders) interpreter round-trips (measured 42.9s at sf1) while
    keying by pmod(xxhash64(o_orderkey), B) costs O(B) invocations with
    the per-order reconciliation done vectorized (pandas groupby + left
    merge) inside each bucket — the only cogroup shape that survives a
    100 TB corpus. B scales with the session's shuffle parallelism so
    per-bucket frames stay bounded as the cluster grows. ``np.rint`` is
    IEEE half-even on the binary double — the exact twin of the oracle's
    ``round_even`` — so the cents totals are bit-identical. The orders
    side carries a quarter's date slice and the items side is
    semi-join-pruned to it before the Python stage (the SF-proportional
    order slice carries no broadcast hint — AQE broadcasts it at bench SF
    and shuffles at cluster scale)."""
    import numpy as np
    import pandas as pd

    t = register(spark, sf_dir, ("orders", "lineitem"))
    nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200")) * 4
    bucket = F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(nbuckets)).alias("bucket")
    orders = (
        t["orders"]
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-03-31"))
        .select("o_orderkey", bucket)
    )
    items = (
        t["lineitem"]
        .select("l_orderkey", "l_extendedprice")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "leftsemi")
        .select(
            "l_orderkey",
            "l_extendedprice",
            F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(nbuckets)).alias("bucket"),
        )
    )

    def reconcile(key, opdf: pd.DataFrame, lpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(opdf):
            # items whose orders fall outside the date slice are pruned
            # upstream, but cogroup's either-side key semantics still
            # require the guard
            return pd.DataFrame({"o_orderkey": [], "n_items": [], "lineitem_cents": []})
        if len(lpdf):
            cents = pd.DataFrame(
                {
                    "l_orderkey": lpdf["l_orderkey"],
                    "c": np.rint(lpdf["l_extendedprice"].to_numpy() * 100).astype("int64"),
                }
            )
            per_order = cents.groupby("l_orderkey", sort=False).agg(
                n_items=("c", "size"), lineitem_cents=("c", "sum")
            )
            out = opdf[["o_orderkey"]].merge(
                per_order, left_on="o_orderkey", right_index=True, how="left"
            )
        else:
            out = opdf[["o_orderkey"]].copy()
            out["n_items"] = 0
            out["lineitem_cents"] = 0
        out["n_items"] = out["n_items"].fillna(0).astype("int64")
        out["lineitem_cents"] = out["lineitem_cents"].fillna(0).astype("int64")
        return out

    return (
        orders.groupBy("bucket")
        .cogroup(items.groupBy("bucket"))
        .applyInPandas(reconcile, schema="o_orderkey bigint, n_items bigint, lineitem_cents bigint")
    )


@query(
    "q56_variant_semistructured",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_decile,
           COUNT(*) AS n_events,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY k_decile
    """,
    tags=("variant", "json", "semistructured"),
)
def q56_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` converts the props string to Variant's binary encoding
    once, and ``variant_get`` does typed path extraction on the binary
    form. At 100 TB this is the right storage shape for ragged JSON —
    parse once at ingest, store VARIANT, and every downstream query skips
    string re-parsing (vs q28's per-query ``get_json_object``)."""
    t = register(spark, sf_dir, ("events",))
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        t["events"]
        .select(F.floor(k / 10).cast("bigint").alias("k_decile"), k.alias("k"))
        .groupBy("k_decile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


_Q57_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@query(
    "q57_sole_blame_suppliers",
    oracle=_Q57_SQL,
    tags=("correlated", "exists", "sql-entry", "tpch-q21"),
)
def q57_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on this schema: suppliers whose line was returned
    in finished multi-supplier orders where NO other supplier's line was
    returned — a correlated EXISTS and NOT EXISTS against the same fact
    table in one query. Catalyst rewrites the pair into a left-semi and a
    null-safe left-anti join on l_orderkey, so the fact shuffles on one
    key three times rather than once per probed row; the SQL text is
    engine-portable and the oracle runs it verbatim."""
    register(spark, sf_dir, ("supplier", "lineitem", "orders"))
    return spark.sql(_Q57_SQL)


@query(
    "q58_map_type_aggregation",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)    AS clicks,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(COUNT(DISTINCT event_type) AS INTEGER)                     AS n_types
    FROM events GROUP BY user_id
    """,
    tags=("map-type", "collection"),
)
def q58_map_type_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user counts collapse into a
    ``map<event_type, count>`` (``map_from_entries`` over collected
    structs) and downstream reads are ``element_at`` lookups +
    ``map_keys`` cardinality. The map is the right shape when the key set
    is ragged/open-ended — a fixed pivot would grow a column per type; the
    oracle checks the extracted values exactly."""
    t = register(spark, sf_dir, ("events",))
    per_type = (
        t["events"].groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).cast("bigint").alias("clicks"),
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).cast("bigint").alias("purchases"),
        F.size(F.map_keys("m")).alias("n_types"),
    )


_Q59_BODY = """
    WITH e AS (
      SELECT NULLIF(event_type, 'error') AS et, value FROM events
    ),
    d AS (SELECT DISTINCT et FROM e)
    SELECT d.et,
           COUNT(*) AS n_events,
           SUM(CAST({rnd} AS BIGINT)) / CAST(100 AS DOUBLE) AS total_value
    FROM d JOIN e ON e.et IS NOT DISTINCT FROM d.et
    GROUP BY d.et
"""


@query(
    "q59_null_semantics",
    oracle=_Q59_BODY.format(rnd="round_even(e.value * 100, 0)"),
    tags=("nulls", "null-safe-join", "sql-entry"),
)
def q59_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: the 'error' type is nulled out, the distinct
    dim (including the NULL member) joins back null-safely (``IS NOT
    DISTINCT FROM`` — a plain equi-join would silently drop the NULL
    group), and GROUP BY places all NULL keys in one group on both
    engines. The pattern behind unknown-member dimension handling in any
    warehouse rollup."""
    register(spark, sf_dir, ("events",))
    return spark.sql(_Q59_BODY.format(rnd="rint(e.value * 100)"))


@query(
    "q60_first_last_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, NULLIF(event_type, 'error') AS et FROM events
    )
    SELECT DISTINCT user_id,
           FIRST_VALUE(et IGNORE NULLS) OVER w AS first_type,
           LAST_VALUE(et IGNORE NULLS)  OVER w AS last_type
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "ignore-nulls", "sql-entry"),
)
def q60_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST_VALUE with IGNORE NULLS over an unbounded frame: each
    user's first and last non-null event type in event-time order (nulls
    synthesized from the 'error' type). The default frame would cut
    LAST_VALUE at the current row — the explicit UNBOUNDED FOLLOWING
    frame is the half of the frame-spec surface ranking windows never
    touch. Total order (ts, event_id) makes both picks deterministic."""
    register(spark, sf_dir, ("events",))
    return spark.sql(
        """
        WITH e AS (
          SELECT user_id, ts, event_id, NULLIF(event_type, 'error') AS et FROM events
        )
        SELECT DISTINCT user_id,
               FIRST_VALUE(et) IGNORE NULLS OVER w AS first_type,
               LAST_VALUE(et)  IGNORE NULLS OVER w AS last_type
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """
    )


_Q61_SQL = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
       AND e.ts > v.t AND e.ts <= v.t + INTERVAL 48 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.ts > c.t AND e.ts <= c.t + INTERVAL 48 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage,     COUNT(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'view>click',               COUNT(*) FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase',      COUNT(*) FROM p
    ) ORDER BY ord
"""


@query(
    "q61_sequential_funnel",
    oracle=_Q61_SQL,
    tags=("funnel", "analytics", "sql-entry"),
)
def q61_sequential_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked within
    48h of their first view, then purchased within 48h of that click —
    each stage anchors on the previous stage's MIN(ts), so ordering is
    event-time-causal with a conversion window, not merely set
    membership (yields 150 → 96 → 58 at sf0.01). Three narrow
    aggregations on user_id (one shuffle key throughout — at scale these
    co-partition); the SQL text is engine-portable and the oracle runs it
    verbatim."""
    register(spark, sf_dir, ("events",))
    return spark.sql(_Q61_SQL)
