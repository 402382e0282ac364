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

from dibimbing_case_study_etl_spark.catalog import register
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
