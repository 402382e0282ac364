"""Round-6 additions II: experimentation analytics (A/B platform ops).

- ``x01`` is CUPED variance reduction (Deng et al. 2013, the standard
  pre-experiment-covariate adjustment every large experimentation
  platform applies before reading a metric): users are split 50/50, the
  experiment window is the second half of the event-time range, each
  user's PRE-period purchase value is the covariate, and the adjusted
  per-variant means plus the achieved variance-reduction ratio (ρ²)
  come out of ONE pass of exact-BIGINT sufficient statistics — the f02
  normal-equation machinery pointed at experiment readout.
- ``x02`` is the sample-ratio-mismatch guardrail: a hash-based 50/50
  assignment (the cross-engine rolling fingerprint — how real systems
  bucket users) χ²-tested against its intended split. SRM is the first
  check any experiment result must pass before x01's lift means
  anything.

The variant assignment (``user_id % 2`` for x01, fingerprint-bucket for
x02) is the deterministic stand-in for an experiment-flag column — the
plan shape with a real flag is identical (the flag rides the user-keyed
aggregate either way).

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl)
has no experimentation surface; beyond-reference analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries import query

# --- x01: CUPED-adjusted A/B readout ---------------------------------------

_X01_ORACLE = f"""
    WITH bounds AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS cut_us FROM events
    ),
    u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) < b.cut_us
                       THEN CAST(round_even(value * 100, 0) AS BIGINT) END), 0)
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) >= b.cut_us
                       THEN CAST(round_even(value * 100, 0) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events CROSS JOIN bounds b
      GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM u
    ),
    pv AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sx_v, CAST(SUM(y) AS BIGINT) AS sy_v
      FROM u GROUP BY variant
    ),
    d AS (
      SELECT pv.variant, pv.n_users, pv.sx_v, pv.sy_v, p.n, p.sx,
             (CAST(p.n AS DOUBLE) * p.sxy - CAST(p.sx AS DOUBLE) * p.sy)
               / (CAST(p.n AS DOUBLE) * p.sxx - CAST(p.sx AS DOUBLE) * p.sx)
               AS theta,
             POWER(CAST(p.n AS DOUBLE) * p.sxy - CAST(p.sx AS DOUBLE) * p.sy, 2)
               / ((CAST(p.n AS DOUBLE) * p.sxx - CAST(p.sx AS DOUBLE) * p.sx)
                  * (CAST(p.n AS DOUBLE) * p.syy - CAST(p.sy AS DOUBLE) * p.sy))
               AS rho2
      FROM pv CROSS JOIN pooled p
    )
    SELECT CAST(variant AS BIGINT) AS variant, n_users,
           {sql_iround("CAST(sy_v AS DOUBLE) / n_users / 100", 2)} AS mean_post,
           {sql_iround("CAST(sx_v AS DOUBLE) / n_users / 100", 2)} AS mean_pre,
           {sql_iround("(CAST(sy_v AS DOUBLE) / n_users - theta * (CAST(sx_v AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n)) / 100", 4)}
             AS mean_post_cuped,
           {sql_iround("theta", 6)} AS theta,
           {sql_iround("rho2", 6)} AS var_reduction
    FROM d
    ORDER BY variant
"""


@query(
    "x01_cuped_ab_lift",
    oracle=_X01_ORACLE,
    tags=("experimentation", "analytics", "events"),
    bench=True,
)
def x01_cuped_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: per-variant mean post-period purchase
    value, its pre-period-covariate-adjusted version
    (``ȳ_v − θ(x̄_v − x̄)`` with the pooled ``θ = cov(x,y)/var(x)``), and
    the achieved variance reduction ρ². The pre/post cutover is the exact
    midpoint of the event-time range in microseconds, so both engines
    derive the identical integer cutoff.

    Scale: the only corpus-sized stage is ONE user-keyed aggregate
    (purchase cents conditionally summed into pre/post per user — exact
    BIGINTs); everything after runs on the per-user table, whose five
    sufficient statistics are again order-independent integer sums.
    θ and ρ² are closed-form — no per-user adjusted column is ever
    materialized, so there is no double-accumulation anywhere."""
    t = register(spark, sf_dir, ("events",))
    e = t["events"]
    bounds = F.broadcast(
        e.agg(
            (
                (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
                / F.lit(2)
            )
            .cast("bigint")
            .alias("cut_us")
        )
    )
    cents = F.call_function("rint", F.col("value") * 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    u = (
        e.crossJoin(bounds)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_p & (F.unix_micros("ts") < F.col("cut_us")), cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(is_p & (F.unix_micros("ts") >= F.col("cut_us")), cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
        .localCheckpoint(eager=False)  # feeds the pooled AND per-variant aggs
    )
    pooled = F.broadcast(
        u.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    pv = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").alias("sx_v"),
        F.sum("y").alias("sy_v"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = cov_n / var_x_n
    rho2 = (cov_n * cov_n) / (var_x_n * var_y_n)
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    return (
        pv.crossJoin(pooled)
        .select(
            F.col("variant").cast("bigint").alias("variant"),
            "n_users",
            iround(mean("sy_v", "n_users") / 100, 2).alias("mean_post"),
            iround(mean("sx_v", "n_users") / 100, 2).alias("mean_pre"),
            iround(
                (mean("sy_v", "n_users") - theta * (mean("sx_v", "n_users") - mean("sx", "n")))
                / 100,
                4,
            ).alias("mean_post_cuped"),
            iround(theta, 6).alias("theta"),
            iround(rho2, 6).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# --- x02: sample-ratio-mismatch guardrail ----------------------------------


def _x02_oracle() -> str:
    from dibimbing_case_study_etl_spark.functions.text import sql_fingerprint

    fp = sql_fingerprint("CAST(user_id AS VARCHAR)")
    return f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ),
    a AS (
      SELECT CASE WHEN ({fp}) % 100 < 50 THEN 0 ELSE 1 END AS variant FROM u
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM a
    )
    SELECT n AS n_users, n_a, n_b,
           {sql_iround(
               "POWER(n_a - n / 2.0, 2) / (n / 2.0) + POWER(n_b - n / 2.0, 2) / (n / 2.0)",
               6,
           )} AS chi2,
           CAST(CASE WHEN {sql_iround(
               "POWER(n_a - n / 2.0, 2) / (n / 2.0) + POWER(n_b - n / 2.0, 2) / (n / 2.0)",
               6,
           )} > 3.841 THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
    FROM c
    """


@query(
    "x02_srm_check",
    oracle=_x02_oracle(),
    tags=("experimentation", "analytics", "quality"),
)
def x02_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: users are assigned to variants by
    hash bucket (the cross-engine rolling fingerprint mod 100 — the
    deterministic bucketing real flag systems use) and the realized split
    is χ²-tested against the intended 50/50. An SRM flag (χ² > 3.841,
    p < 0.05 at 1 dof) means the assignment itself is broken and every
    downstream metric (x01's lift included) is invalid — the first gate
    of any experiment readout.

    Scale: one DISTINCT over users (the only shuffle), a map-side
    fingerprint, and a single-row counting aggregate; the χ² arithmetic
    is identical double math on exact integer counts."""
    from dibimbing_case_study_etl_spark.functions.text import fingerprint

    t = register(spark, sf_dir, ("events",))
    u = t["events"].select("user_id").distinct()
    variant = F.when(
        F.pmod(fingerprint("CAST(user_id AS STRING)"), F.lit(100)) < 50, 0
    ).otherwise(1)
    c = u.select(variant.alias("variant")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    half = F.col("n") / 2.0
    chi2_raw = (
        F.pow(F.col("n_a") - half, 2) / half + F.pow(F.col("n_b") - half, 2) / half
    )
    chi2 = iround(chi2_raw, 6)
    return c.select(
        F.col("n").alias("n_users"),
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


# --- x03: experiment power / minimum detectable effect ---------------------

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621  # 80% power

_X03_ORACLE = f"""
    WITH bounds AS (
      SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS cut_us FROM events
    ),
    u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) < b.cut_us
                       THEN CAST(round_even(value * 100, 0) AS BIGINT) END), 0)
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            AND epoch_us(ts) >= b.cut_us
                       THEN CAST(round_even(value * 100, 0) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events CROSS JOIN bounds b
      GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM u
    ),
    d AS (
      SELECT n, LEAST(n_a, n_b) AS n_arm, sy,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * (n - 1)) AS var_y_cents2,
             POWER(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
               / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS rho2
      FROM s
    )
    SELECT n AS n_users, n_arm,
           {sql_iround("sqrt(var_y_cents2) / 100", 4)} AS sigma_y,
           {sql_iround(f"({_Z_ALPHA} + {_Z_BETA}) * sqrt(2 * var_y_cents2 / n_arm) / 100", 4)}
             AS mde_abs,
           {sql_iround(f"({_Z_ALPHA} + {_Z_BETA}) * sqrt(2 * var_y_cents2 * (1 - rho2) / n_arm) / 100", 4)}
             AS mde_cuped_abs,
           {sql_iround(f"100 * ({_Z_ALPHA} + {_Z_BETA}) * sqrt(2 * var_y_cents2 / n_arm) / (CAST(sy AS DOUBLE) / n)", 4)}
             AS mde_rel_pct,
           {sql_iround("rho2", 6)} AS var_reduction
    FROM d
"""


@query(
    "x03_experiment_power_mde",
    oracle=_X03_ORACLE,
    tags=("experimentation", "analytics", "events"),
)
def x03_experiment_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing: the minimum detectable effect at 80% power /
    5% two-sided significance for the purchase-value metric, with and
    without x01's CUPED adjustment (MDE shrinks by √(1−ρ²) — the
    concrete payoff of variance reduction, in dollars). This is the
    number a platform quotes BEFORE running an experiment; x02 gates the
    assignment, x01 reads the result.

    Scale: identical shape to x01 — one user-keyed exact-BIGINT
    aggregate, then closed-form arithmetic on a single row of sufficient
    statistics; the variance and ρ² never touch a per-user double."""
    t = register(spark, sf_dir, ("events",))
    e = t["events"]
    bounds = F.broadcast(
        e.agg(
            ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2))
            .cast("bigint")
            .alias("cut_us")
        )
    )
    cents = F.call_function("rint", F.col("value") * 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    u = (
        e.crossJoin(bounds)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_p & (F.unix_micros("ts") < F.col("cut_us")), cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(is_p & (F.unix_micros("ts") >= F.col("cut_us")), cents)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    var_y = (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")) / (
        nd * (F.col("n") - 1)
    )
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    rho2 = (cov_n * cov_n) / (var_x_n * var_y_n)
    n_arm = F.least("n_a", "n_b")
    z = F.lit(_Z_ALPHA + _Z_BETA)
    mde_c = z * F.sqrt(2 * var_y / n_arm)  # cents
    return s.select(
        F.col("n").alias("n_users"),
        n_arm.alias("n_arm"),
        iround(F.sqrt(var_y) / 100, 4).alias("sigma_y"),
        iround(mde_c / 100, 4).alias("mde_abs"),
        iround(z * F.sqrt(2 * var_y * (1 - rho2) / n_arm) / 100, 4).alias(
            "mde_cuped_abs"
        ),
        iround(100 * mde_c / (F.col("sy").cast("double") / F.col("n")), 4).alias(
            "mde_rel_pct"
        ),
        iround(rho2, 6).alias("var_reduction"),
    )


# --- r05: ranking-quality evaluation (NDCG / MRR / P@10) -------------------


_R05_STRONG = 10  # "strongly relevant" grade floor for MRR / P@10


def _r05_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
        _BM25_TERMS,
        _R01_ORACLE,
    )

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    rel = f"len(list_filter(w, t -> t IN ({terms})))"
    gain = "CAST(round_even(rel / log2(rnk + 1) * 1000000, 0) AS BIGINT)"
    return f"""
    WITH dd AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    rels AS (SELECT doc_id, CAST({rel} AS BIGINT) AS rel FROM dd),
    ranked AS (
      SELECT r.doc_id, rels.rel,
             CAST(ROW_NUMBER() OVER (ORDER BY r.score DESC, r.doc_id) AS BIGINT) AS rnk
      FROM ({_R01_ORACLE}) r JOIN rels ON rels.doc_id = r.doc_id
    ),
    dcg AS (
      SELECT CAST(SUM(CASE WHEN rnk <= 10 THEN {gain} END) AS BIGINT) AS dcg_s,
             CAST(SUM(CASE WHEN rnk <= 10 AND rel >= {_R05_STRONG} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_top10,
             CAST(MIN(CASE WHEN rel >= {_R05_STRONG} THEN rnk END) AS BIGINT) AS first_good
      FROM ranked
    ),
    ideal AS (
      SELECT CAST(SUM({gain}) AS BIGINT) AS idcg_s FROM (
        SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS rnk
        FROM rels ORDER BY rel DESC, doc_id LIMIT 10
      )
    )
    SELECT 'bm25' AS ranker,
           CAST(50 AS BIGINT) AS n_ranked,
           {sql_iround("CAST(dcg_s AS DOUBLE) / idcg_s", 6)} AS ndcg_at_10,
           {sql_iround("CASE WHEN first_good IS NOT NULL THEN 1.0 / first_good ELSE 0.0 END", 6)}
             AS mrr,
           {sql_iround("CAST(n_rel_top10 AS DOUBLE) / 10", 6)} AS p_at_10
    FROM dcg CROSS JOIN ideal
    """


@query(
    "r05_ranking_quality_eval",
    oracle=_r05_oracle(),
    tags=("llm", "retrieval", "evaluation"),
)
def r05_ranking_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation harness for the retrieval stack: NDCG@10 (linear
    gain), MRR, and precision@10 of r01's BM25 ranking against a graded
    relevance label — the TOTAL count of query-term occurrences in the
    document (a deterministic stand-in for editorial judgments with real
    spread: 0..19 at sf0.01, so BM25's length normalization genuinely
    trades against it and no metric saturates; "strong" relevance for
    MRR/P@10 is ≥{strong} occurrences). r01 retrieves, r03 fuses, r04
    expands — r05 is how you decide whether any of it helped.

    Scale: the corpus-sized work is r01's ranking plus one map-stage
    relevance projection; DCG gains are scaled-int-rounded per rank then
    exactly summed (order-independent), the ideal-DCG top-10 is a
    TakeOrderedAndProject, and the final row is a cross of three
    single-row broadcast aggregates."""
    from dibimbing_case_study_etl_spark.functions.text import tokens
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
        _BM25_TERMS,
        r01_bm25_topk,
    )

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    from dibimbing_case_study_etl_spark.functions.text import marker_score

    rel_expr = marker_score(F.col("text"), _BM25_TERMS)
    rels = docs.select("doc_id", rel_expr.alias("rel")).localCheckpoint(eager=False)
    w = _gw().orderBy(F.col("score").desc(), "doc_id")
    ranked = (
        r01_bm25_topk(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .join(rels, "doc_id")
    )
    gain = lambda: F.call_function(  # noqa: E731
        "rint", F.col("rel") / F.log2(F.col("rnk") + 1) * 1_000_000
    ).cast("bigint")
    dcg = F.broadcast(
        ranked.agg(
            F.sum(F.when(F.col("rnk") <= 10, gain())).cast("bigint").alias("dcg_s"),
            F.sum(
                F.when((F.col("rnk") <= 10) & (F.col("rel") >= _R05_STRONG), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel_top10"),
            F.min(F.when(F.col("rel") >= _R05_STRONG, F.col("rnk")))
            .cast("bigint")
            .alias("first_good"),
        )
    )
    ideal = F.broadcast(
        rels.orderBy(F.col("rel").desc(), "doc_id")
        .limit(10)
        .withColumn(
            "rnk", F.row_number().over(_gw().orderBy(F.col("rel").desc(), "doc_id")).cast("bigint")
        )
        .agg(F.sum(gain()).cast("bigint").alias("idcg_s"))
    )
    return dcg.crossJoin(ideal).select(
        F.lit("bm25").alias("ranker"),
        F.lit(50).cast("bigint").alias("n_ranked"),
        iround(F.col("dcg_s").cast("double") / F.col("idcg_s"), 6).alias("ndcg_at_10"),
        iround(
            F.when(
                F.col("first_good").isNotNull(), 1.0 / F.col("first_good")
            ).otherwise(0.0),
            6,
        ).alias("mrr"),
        iround(F.col("n_rel_top10").cast("double") / 10, 6).alias("p_at_10"),
    )


# --- d19: bloom-filter false-positive-rate audit ---------------------------

_D19_M = 131072  # 2^17 bits
_D19_K = 4  # independent 28-bit md5 chunks


def _d19_oracle() -> str:
    pos = lambda i: (  # noqa: E731
        f"CAST(('0x' || substr(md5(key), {1 + 7 * i}, 7)) AS BIGINT) % {_D19_M}"
    )
    pos_rows = " UNION ALL ".join(
        f"SELECT key, {i} AS i, {pos(i)} AS pos FROM {{src}}" for i in range(_D19_K)
    )
    return f"""
    WITH bkeys AS (
      SELECT DISTINCT text AS key FROM documents WHERE doc_id % 5 = 0
    ),
    pkeys AS (
      SELECT DISTINCT text AS key FROM documents
      WHERE doc_id % 5 <> 0 AND text NOT IN (SELECT key FROM bkeys)
    ),
    bits AS (
      SELECT DISTINCT pos FROM ({pos_rows.format(src="bkeys")})
    ),
    probe AS (
      SELECT p.key,
             SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM ({pos_rows.format(src="pkeys")}) p
      LEFT JOIN bits ON p.pos = bits.pos
      GROUP BY p.key
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bkeys) AS n_build,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probe,
             CAST(SUM(CASE WHEN n_hit = {_D19_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positive
      FROM probe
    )
    SELECT n_build, n_probe, n_bits_set, n_false_positive,
           {sql_iround("CAST(n_false_positive AS DOUBLE) / n_probe", 6)} AS measured_fpr,
           {sql_iround(f"POWER(CAST(n_bits_set AS DOUBLE) / {_D19_M}, {_D19_K})", 6)}
             AS fill_fpr,
           {sql_iround(f"POWER(1 - EXP(-{_D19_K}.0 * n_build / {_D19_M}), {_D19_K})", 6)}
             AS theory_fpr
    FROM agg
    """


@query(
    "d19_bloom_fpr_audit",
    oracle=_d19_oracle(),
    tags=("llm", "dedup", "bloom", "audit"),
)
def d19_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter calibration for the d13 decontamination pattern: a
    filter is built from 20% of document texts (k={k} positions per key
    from independent md5 chunks, m={m} bits) and probed with every text
    KNOWN to be absent — so every 'maybe' is a false positive by
    construction. Reports the measured FPR against both the fill-ratio
    prediction (ρ^k on the actual set-bit count) and the closed-form
    (1−e^(−kn/m))^k sizing formula. d13 trusts the no-false-negative
    side; d19 measures the false-POSITIVE side that sizes the verify
    join behind the prefilter. The md5 position family makes the whole
    bit array bit-for-bit reproducible in the oracle.

    Scale: build-side positions collapse to a DISTINCT set (the bit
    array, ≤m rows) broadcast to the probe scan; the probe side is a
    map-stage position expansion (k rows per key) + one key-keyed count
    — no corpus-sized shuffle carries payloads, exactly the d13
    membership-test-before-shuffle shape being audited."""
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    bkeys = (
        docs.filter(F.col("doc_id") % 5 == 0).select(F.col("text").alias("key")).distinct()
    )
    pkeys = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.col("text").alias("key"))
        .distinct()
        .join(bkeys, "key", "left_anti")
    )

    def positions(df: DataFrame) -> DataFrame:
        m = F.md5(F.col("key"))
        return df.select(
            "key",
            F.explode(
                F.array(
                    *[
                        (F.conv(F.substring(m, 1 + 7 * i, 7), 16, 10).cast("long") % _D19_M).alias("p")
                        for i in range(_D19_K)
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(bkeys).select("pos").distinct().localCheckpoint(eager=False)
    probe = (
        positions(pkeys)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    agg = (
        probe.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe"),
            F.sum(F.when(F.col("n_hit") == _D19_K, 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_positive"),
        )
        .crossJoin(F.broadcast(bkeys.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))))
        .crossJoin(F.broadcast(bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))))
    )
    return agg.select(
        "n_build",
        "n_probe",
        "n_bits_set",
        "n_false_positive",
        iround(F.col("n_false_positive").cast("double") / F.col("n_probe"), 6).alias(
            "measured_fpr"
        ),
        iround(
            F.pow(F.col("n_bits_set").cast("double") / _D19_M, _D19_K), 6
        ).alias("fill_fpr"),
        iround(
            F.pow(1 - F.exp(-float(_D19_K) * F.col("n_build") / _D19_M), _D19_K), 6
        ).alias("theory_fpr"),
    )


d19_bloom_fpr_audit.__doc__ = d19_bloom_fpr_audit.__doc__.format(k=_D19_K, m=_D19_M)
r05_ranking_quality_eval.__doc__ = r05_ranking_quality_eval.__doc__.format(
    strong=_R05_STRONG
)


# --- m09: video shot-boundary detection ------------------------------------

_M09_THRESHOLD = 120


@query(
    "m09_video_shot_boundaries",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, fi,
             CAST(list_sum(list_transform(
               generate_series(1, 8),
               i -> unicode(substring(text, CAST(fi * 8 + i AS INTEGER), 1))
             )) AS BIGINT) AS s
      FROM (
        SELECT doc_id, text,
               UNNEST(generate_series(0, CAST(length(text) // 8 AS BIGINT) - 1)) AS fi
        FROM documents WHERE length(text) >= 8
      )
    ),
    d AS (
      SELECT doc_id, s - LAG(s) OVER (PARTITION BY doc_id ORDER BY fi) AS delta
      FROM f
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(1 + COALESCE(SUM(CASE WHEN abs(delta) > {_M09_THRESHOLD}
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shots,
           CAST(COALESCE(MAX(abs(delta)), 0) AS BIGINT) AS max_diff,
           {sql_iround(f"COUNT(*) * 1.0 / (1 + COALESCE(SUM(CASE WHEN abs(delta) > {_M09_THRESHOLD} THEN 1 ELSE 0 END), 0))", 4)}
             AS mean_shot_len
    FROM d
    GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "video"),
)
def m09_video_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the fake-video table (m03's format):
    per-frame byte-sum intensity, a cut wherever the frame-to-frame
    delta exceeds {th} — the classic intensity-difference detector, with
    per-document shot structure (frame count, shot count, max delta,
    mean shot length) as the output a video-curation pipeline partitions
    training clips by. The oracle recomputes the byte signal from the
    synthetic construction (ASCII ⇒ byte sum = codepoint sum), so the
    whole chain — framing, signal, detection — is value-checked.

    Scale: ONE Arrow pass emits one row per document; the frame-level
    signal lives and dies inside the task (never shuffled, never
    collected) — see ``operators/multimodal.shot_boundaries``."""
    from dibimbing_case_study_etl_spark.operators.multimodal import (
        shot_boundaries,
        synth_video_table,
    )

    t = register(spark, sf_dir, ("documents",))
    videos = synth_video_table(t["documents"], "doc_id", "text", frame_bytes=8, fps=24)
    return shot_boundaries(videos, threshold=_M09_THRESHOLD)


m09_video_shot_boundaries.__doc__ = m09_video_shot_boundaries.__doc__.format(
    th=_M09_THRESHOLD
)
