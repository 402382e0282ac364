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
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
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


# --- s15: the full IVF+PQ serving stack, audited end to end ---------------

_S15_NCELLS = 16
_S15_NPROBE = 8
_S15_M = 4          # PQ subspaces
_S15_KSUB = 16      # codewords per subspace
_S15_DSUB = 16      # dim (64) / m
_S15_K = 10
_S15_NQ = 10        # query vectors: vec_id < 10


def _s15_oracle() -> str:
    dsub, m, ksub = _S15_DSUB, _S15_M, _S15_KSUB
    clamped = "least(1.0, greatest(-1.0, list_cosine_similarity({a}, {b})))"
    exact_cos = clamped.format(a="q.v", b="c.v")
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      FROM vecs
    ),
    cents AS (
      SELECT vec_id AS cell, v AS cv FROM vecs ORDER BY vec_id LIMIT {_S15_NCELLS}
    ),
    cell_scores AS (
      SELECT a.vec_id, a.v, cents.cell,
             {clamped.format(a="a.v", b="cents.cv")} AS sim
      FROM vecs a CROSS JOIN cents
    ),
    c_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM cell_scores
      ) WHERE rn = 1
    ),
    q_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM cell_scores WHERE vec_id < {_S15_NQ}
      ) WHERE rn <= {_S15_NPROBE}
    ),
    seeds AS (
      SELECT nv, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT * FROM norms ORDER BY vec_id LIMIT {ksub})
    ),
    js AS (SELECT unnest(generate_series(0, {m - 1})) AS j),
    books AS (
      SELECT j, code, nv[j * {dsub} + 1 : (j + 1) * {dsub}] AS cw
      FROM seeds CROSS JOIN js
    ),
    subs AS (
      SELECT vec_id, j, nv[j * {dsub} + 1 : (j + 1) * {dsub}] AS sv
      FROM norms CROSS JOIN js
    ),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT vec_id, subs.j, code, ROW_NUMBER() OVER (
          PARTITION BY vec_id, subs.j
          ORDER BY list_sum(list_transform(list_zip(sv, cw),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))), code) AS rn
        FROM subs JOIN books ON subs.j = books.j
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM q_assign q JOIN c_assign c USING (cell)
      WHERE c.vec_id <> q.vec_id
    ),
    adc AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(SUM(CAST(round_even(list_dot_product(
                    qn.nv[enc.j * {dsub} + 1 : (enc.j + 1) * {dsub}], b.cw
                  ) * 1000000000, 0) AS BIGINT)) AS BIGINT) AS s_i
      FROM cand
      JOIN enc ON enc.vec_id = cand.neighbor_id
      JOIN books b ON b.j = enc.j AND b.code = enc.code
      JOIN norms qn ON qn.vec_id = cand.query_id
      GROUP BY 1, 2
    ),
    approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY s_i DESC, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {_S15_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {sql_iround(exact_cos, 6)} DESC, c.vec_id) AS rn
        FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_S15_NQ}
      ) WHERE rn <= {_S15_K}
    )
    SELECT a.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_approx,
           CAST(COUNT(e.neighbor_id) AS BIGINT) AS n_hits,
           {sql_iround(f"COUNT(e.neighbor_id) / CAST({_S15_K} AS DOUBLE)", 6)} AS recall
    FROM approx a
    LEFT JOIN exact e
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY a.query_id
    """


@query(
    "s15_ivfpq_serving_recall",
    oracle=_s15_oracle(),
    tags=("llm", "similarity", "ivf", "pq", "audit"),
)
def s15_ivfpq_serving_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL approximate-serving stack — IVF cell routing (s06's
    structure) feeding PQ asymmetric-distance scoring (s07's quantizer) —
    audited end to end as recall@{k} against the exact top-{k}: the one
    number an IVF-PQ deployment (the FAISS IVFPQ serving default)
    publishes. s06r audits routing alone and s07r the quantizer alone;
    this composes them, so a regression in EITHER stage (or in how they
    hand off) moves a driver-hashed integer.

    Cross-engine exactness: every float op is the sequential JVM fold that
    is bitwise-equal to DuckDB's list functions (`functions/vector`
    contract) — seeded centroids, seeded codebooks (the 16 lowest-id
    normalized vectors, no Lloyd, no numpy anywhere in this audit path),
    per-subspace ADC dots rounded to scaled BIGINT before the
    order-independent sum, ranks on (rounded score, id). The production
    encode path (numpy/Arrow `pq_encode`) is s07's; here the encode runs
    as a JVM argmin over the broadcast 64-row codeword table precisely so
    the oracle can replay it bit for bit.

    Scale: codewords/centroids are model-sized broadcasts; corpus encode
    is a map-side argmin (64 candidates per subspace row); candidates
    form per probed cell (never all-pairs); the ADC sum shuffles
    (query, neighbor, j) triples with partial aggregation; top-k is a
    bounded per-query window. The exact side is the audit harness, runs
    on {nq} pinned queries only.
    """
    from dibimbing_case_study_etl_spark.functions.vector import as_double, cosine, dot

    t = register(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select("vec_id", "embedding")

    v = as_double(F.col("embedding"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    norms = e.select("vec_id", F.transform(v, lambda x: x / nrm).alias("nv"))

    cents = F.broadcast(
        e.orderBy("vec_id")
        .limit(_S15_NCELLS)
        .select(F.col("vec_id").alias("cell"), v.alias("cv"))
    )
    scored = (
        e.select("vec_id", v.alias("v"))
        .join(cents, F.lit(True))
        .withColumn("sim", cosine(F.col("v"), F.col("cv")))
        .select("vec_id", "cell", "sim")
    )
    w_cell = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    ranked = scored.withColumn("rn", F.row_number().over(w_cell))
    c_assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell")
    q_assign = (
        ranked.filter((F.col("vec_id") < _S15_NQ) & (F.col("rn") <= _S15_NPROBE))
        .select("vec_id", "cell")
    )

    # seeded codebooks: 16 lowest-id NORMALIZED vectors, sliced per subspace
    seeds = (
        norms.orderBy("vec_id")
        .limit(_S15_KSUB)
        .select("nv", (F.row_number().over(_gw().orderBy("vec_id")) - 1).alias("code"))
    )
    js = spark.range(_S15_M).select(F.col("id").cast("int").alias("j"))
    books = F.broadcast(
        seeds.crossJoin(js).select(
            "j",
            "code",
            F.slice(F.col("nv"), F.col("j") * _S15_DSUB + 1, _S15_DSUB).alias("cw"),
        )
    )

    # JVM corpus encode: argmin d2 over the broadcast codeword table
    subs = norms.crossJoin(js).select(
        "vec_id",
        "j",
        F.slice(F.col("nv"), F.col("j") * _S15_DSUB + 1, _S15_DSUB).alias("sv"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cw"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    enc = (
        subs.join(books, "j")
        .select("vec_id", "j", "code", d2.alias("d2"))
        .groupBy("vec_id", "j")
        .agg(F.min_by("code", F.struct("d2", "code")).alias("code"))
    )

    cand = (
        q_assign.alias("q")
        .join(c_assign.alias("c"), "cell")
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"), F.col("c.vec_id").alias("neighbor_id")
        )
        .distinct()
    )
    qn = norms.filter(F.col("vec_id") < _S15_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qnv")
    )
    adc = (
        cand.join(enc, cand.neighbor_id == enc.vec_id)
        .join(books, ["j", "code"])
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.call_function(
                "rint",
                dot(F.slice(F.col("qnv"), F.col("j") * _S15_DSUB + 1, _S15_DSUB), F.col("cw"))
                * 1_000_000_000,
            )
            .cast("bigint")
            .alias("sj"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("sj").alias("s_i"))
    )
    w_q = W.partitionBy("query_id").orderBy(F.desc("s_i"), F.asc("neighbor_id"))
    approx = (
        adc.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= _S15_K)
        .select("query_id", "neighbor_id")
    )

    qv = e.filter(F.col("vec_id") < _S15_NQ).select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    )
    exact_scored = (
        e.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"))
        .join(F.broadcast(qv), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", iround(cosine(F.col("qv"), F.col("cv")), 6).alias("r")
        )
    )
    w_e = W.partitionBy("query_id").orderBy(F.desc("r"), F.asc("neighbor_id"))
    exact = (
        exact_scored.withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= _S15_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )

    return (
        approx.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_approx"),
            F.sum(F.coalesce("hit", F.lit(0)).cast("bigint")).alias("n_hits"),
        )
        .select(
            "query_id",
            "n_approx",
            "n_hits",
            iround(F.col("n_hits") / float(_S15_K), 6).alias("recall"),
        )
    )


# --- p03: incremental corpus-refresh pipeline -----------------------------

_P03_Q_MIN = 0.5  # admission threshold on t02's composite quality score


def _p03_oracle() -> str:
    from dibimbing_case_study_etl_spark.functions.text import EN_STOPWORDS
    from dibimbing_case_study_etl_spark.queries.llm_ops import _sql_marker_score
    from dibimbing_case_study_etl_spark.queries.llm_ops4 import (
        _D14_INCOMING,
        _D14_JACCARD,
        _D14_K,
    )

    sh = (
        "unnest(list_distinct(list_transform("
        f"generate_series(1, greatest(len(regexp_split_to_array(trim(text), ' +')) - {_D14_K - 1}, 0)), "
        f"idx -> array_to_string(list_slice(regexp_split_to_array(trim(text), ' +'), idx, idx + {_D14_K - 1}), ' ')"
        "))) AS s"
    )
    q = (
        "round_even((0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)"
        " + 0.5 * LEAST(1.0, n_tokens / 100.0)) * 10000, 0) / 10000.0"
    )
    return f"""
    WITH existing AS (SELECT * FROM documents WHERE NOT ({_D14_INCOMING})),
    incoming AS (SELECT * FROM documents WHERE {_D14_INCOMING}),
    exact AS (
      SELECT i.doc_id FROM incoming i JOIN existing e ON md5(i.text) = md5(e.text)
      GROUP BY i.doc_id
    ),
    ish AS (SELECT doc_id, {sh} FROM incoming),
    esh AS (SELECT doc_id, {sh} FROM existing),
    sizes_i AS (SELECT doc_id, COUNT(*) AS n FROM ish GROUP BY doc_id),
    sizes_e AS (SELECT doc_id, COUNT(*) AS n FROM esh GROUP BY doc_id),
    common AS (
      SELECT ish.doc_id AS di, esh.doc_id AS de, COUNT(*) AS c
      FROM ish JOIN esh USING (s) GROUP BY 1, 2
    ),
    near AS (
      SELECT di AS doc_id FROM common
      JOIN sizes_i ON sizes_i.doc_id = common.di
      JOIN sizes_e ON sizes_e.doc_id = common.de
      WHERE CAST(c AS DOUBLE) / (sizes_i.n + sizes_e.n - c) >= {_D14_JACCARD}
      GROUP BY di
    ),
    verdicts AS (
      SELECT i.doc_id, i.source,
             CAST(len(regexp_split_to_array(trim(i.text), ' +')) AS BIGINT) AS n_tokens,
             {_sql_marker_score(EN_STOPWORDS).replace("text", "i.text")} AS n_stop,
             CASE WHEN exact.doc_id IS NOT NULL THEN 'exact'
                  WHEN near.doc_id IS NOT NULL THEN 'near'
                  ELSE 'new' END AS verdict
      FROM incoming i
      LEFT JOIN exact ON exact.doc_id = i.doc_id
      LEFT JOIN near ON near.doc_id = i.doc_id
    ),
    scored AS (SELECT source, verdict, n_tokens, {q} AS qs FROM verdicts)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN verdict = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN verdict = 'near' THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(SUM(CASE WHEN verdict = 'new' AND qs < {_P03_Q_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lowq,
           CAST(SUM(CASE WHEN verdict = 'new' AND qs >= {_P03_Q_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted,
           CAST(SUM(CASE WHEN verdict = 'new' AND qs >= {_P03_Q_MIN} THEN n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_accepted,
           {sql_iround(f"SUM(CASE WHEN verdict = 'new' AND qs >= {_P03_Q_MIN} THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)", 6)}
             AS accept_rate
    FROM scored
    GROUP BY source
    """


@query(
    "p03_incremental_refresh_pipeline",
    oracle=_p03_oracle(),
    tags=("llm", "pipeline", "incremental", "dedup", "quality"),
)
def p03_incremental_refresh_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end INCREMENTAL corpus refresh — the daily-ingest
    counterpart of p01's from-scratch build: the incoming batch is
    classified against the existing corpus (d14's exact-hash and
    shingle-Jaccard arms), survivors pass t02's composite quality gate,
    and the output is the per-source admission report (exact/near/low-
    quality rejections, accepted docs + their token mass, accept rate) —
    the table a continuously-ingesting pipeline publishes after every
    batch.

    Scale: composes the already-audited incremental shapes — d14's
    incoming×existing-only comparison (no incoming self-join, no corpus
    self-join) feeds verdicts; the quality gate is map-side expressions
    on the incoming batch alone; the report is one |sources|-keyed
    partial agg. The whole pipeline is one lazy plan: nothing
    materializes between stages except d14's two shingle-index
    checkpoints (shared by its size aggregate and candidate join).
    """
    from dibimbing_case_study_etl_spark.functions.text import (
        EN_STOPWORDS,
        marker_score,
        token_count,
    )
    from dibimbing_case_study_etl_spark.queries.llm_ops4 import (
        _D14_INCOMING,
        d14_incremental_dedup,
    )

    t = register(spark, sf_dir, ("documents",))
    verdicts = d14_incremental_dedup(spark, sf_dir).select("doc_id", "verdict")

    n_tokens = token_count(F.col("text"))
    qs = iround(
        0.5 * (marker_score(F.col("text"), EN_STOPWORDS) / n_tokens)
        + 0.5 * F.least(F.lit(1.0), n_tokens / 100.0),
        4,
    )
    incoming = (
        t["documents"]
        .filter(F.expr(_D14_INCOMING))
        .select("doc_id", "source", n_tokens.alias("n_tokens"), qs.alias("qs"))
    )
    new_ok = (F.col("verdict") == "new") & (F.col("qs") >= _P03_Q_MIN)
    return (
        incoming.join(verdicts, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum((F.col("verdict") == "exact").cast("bigint")).alias("n_exact"),
            F.sum((F.col("verdict") == "near").cast("bigint")).alias("n_near"),
            F.sum(((F.col("verdict") == "new") & (F.col("qs") < _P03_Q_MIN)).cast("bigint")).alias(
                "n_lowq"
            ),
            F.sum(new_ok.cast("bigint")).alias("n_accepted"),
            F.sum(F.when(new_ok, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "tokens_accepted"
            ),
            iround(
                F.sum(new_ok.cast("bigint")) / F.count(F.lit(1)).cast("double"), 6
            ).alias("accept_rate"),
        )
    )
