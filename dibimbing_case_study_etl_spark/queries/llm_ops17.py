"""Round-7 session-2 additions: CUSUM changepoint monitoring and a
Count-Min heavy-hitter calibration audit.

- ``f07`` closes the monitoring gap between f05's EWMA backtest and
  q77's rolling z-score: a two-sided CUSUM over the daily revenue
  series against a fixed baseline window, the classical
  smallest-detectable-shift sequential monitor (Page 1954). The whole
  statistic is EXACT BIGINT arithmetic — the recursive
  ``S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − k)`` is re-expressed as
  ``prefix_sum − running_min(prefix_sum)`` (both windowed integer
  aggregates), so even the alarm decisions hash-match across engines.
- ``t48`` completes the sketch-calibration family (d18 MinHash, d19
  Bloom, q37r HLL/quantile): a Count-Min sketch (Cormode &
  Muthukrishnan) built as ONE partial-aggregable groupBy, probed for
  the exact top-k tokens — est ≥ true (the CM one-sided guarantee) is
  hash-checked as a theorem, and the q-error column measures how much
  a D×W=4×256 sketch over-counts at each SF.

Reference parity: the reference has no monitoring/sketch surface
(its analytics delegate to pandas; the ``airflow/dags/dag_*.py`` DAGs
just schedule); these are the 100 TB-scale operators the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import tokens
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.queries import query

# --- f07: two-sided CUSUM changepoint monitor ---------------------------------

# Baseline period: the series' first two calendar years (the testdata
# orders span 1995-01 … 2001-08) establish the in-control mean μ0; the
# monitor then watches the whole series. Slack k = μ0/10 (detect
# sustained shifts ≥ ~20% of baseline at half-shift slack); alarm
# threshold H = 5·μ0 of accumulated excess.
_F07_BASELINE_END = "1997-01-01"

_F07_ORACLE = f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(round_even(o_totalprice, 0) AS BIGINT)) AS s
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT SUM(s) AS s0, COUNT(*) AS n0
      FROM daily WHERE d < DATE '{_F07_BASELINE_END}'
    ),
    inc AS (
      -- increments scaled by 10·n0 so slack k = μ0/10 stays integral:
      -- up:   10·n0·(s − μ0 − k) = 10·n0·s − 11·s0
      -- down: 10·n0·(μ0 − k − s) =  9·s0 − 10·n0·s
      SELECT d, s,
             10 * b.n0 * s - 11 * b.s0 AS iu,
             9 * b.s0 - 10 * b.n0 * s  AS idn,
             b.s0 AS s0, b.n0 AS n0
      FROM daily CROSS JOIN base b
    ),
    pre AS (
      SELECT d, s, s0, n0,
             SUM(iu)  OVER w AS pu,
             SUM(idn) OVER w AS pd
      FROM inc WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    ),
    cusum AS (
      -- S⁺ₜ = Pₜ − min(0, min_{{i≤t}} Pᵢ): exact integers end to end
      SELECT d, s, s0, n0,
             pu - LEAST(MIN(pu) OVER w, 0) AS cu,
             pd - LEAST(MIN(pd) OVER w, 0) AS cd
      FROM pre WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    )
    SELECT d,
           CAST(s AS BIGINT) AS revenue,
           {sql_iround("CAST(cu AS DOUBLE) / (10.0 * n0)", 4)} AS cusum_up,
           {sql_iround("CAST(cd AS DOUBLE) / (10.0 * n0)", 4)} AS cusum_down,
           CAST(CASE WHEN cu > 50 * s0 THEN 1 ELSE 0 END AS BIGINT) AS alarm_up,
           CAST(CASE WHEN cd > 50 * s0 THEN 1 ELSE 0 END AS BIGINT) AS alarm_down
    FROM cusum
"""


@query(
    "f07_cusum_changepoint",
    oracle=_F07_ORACLE,
    tags=("forecast", "monitoring", "changepoint"),
)
def f07_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint monitor (Page's test) over the daily
    revenue series: accumulate excess above/below a fixed-baseline mean
    μ0 (first two years) with slack k = μ0/10, alarm when the
    accumulated excess passes H = 5·μ0 — the sequential monitor that
    detects small sustained level shifts long before any single-day
    z-score fires (complements q77/f05, which score days in isolation).

    Cross-engine exactness: the classical recursion
    ``S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − k)`` is not a windowed aggregate, but it
    equals ``Pₜ − min(0, min_{i≤t} Pᵢ)`` for the plain prefix sum
    ``Pₜ = Σᵢ≤ₜ (xᵢ − k)`` — two stock window functions. Revenue becomes
    integer dollars per row BEFORE any aggregate, and the increments are
    scaled by 10·n0 so μ0 and k never materialize as doubles: prefix
    sums, running minima, and BOTH alarm comparisons are exact BIGINT
    ops (overflow headroom ~10⁶× at sf4), making even the alarm bits
    hash-deterministic. Doubles appear only in the final display
    division, rounded identically on both sides.

    Scale: the corpus-sized work is one partial-aggregable groupBy(day);
    everything after runs on the bounded calendar table (~2,400 rows —
    the sanctioned ``global_bounded`` window per
    ``functions/windows.py``), so the monitor costs one scan at any SF.
    """
    t = register(spark, sf_dir, ("orders",))
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("DAY", F.col("o_orderdate")).alias("d"))
        .agg(
            F.sum(F.call_function("rint", F.col("o_totalprice")).cast("bigint")).alias("s")
        )
    )
    # baseline totals as window aggregates over the SAME bounded calendar
    # partition the monitor runs in: one orders scan, one groupBy(day),
    # zero joins (a separate filter+agg would re-derive `daily` and scan
    # orders twice — the plan pin in tests/test_plans.py holds this shape)
    in_base = F.col("d") < F.lit(_F07_BASELINE_END).cast("timestamp")
    w_all = _gw().orderBy("d").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    inc = daily.select(
        "d",
        "s",
        F.sum(F.when(in_base, F.col("s"))).over(w_all).alias("s0"),
        F.sum(F.when(in_base, F.lit(1)).otherwise(F.lit(0))).over(w_all).alias("n0"),
    ).select(
        "d",
        "s",
        "s0",
        "n0",
        (10 * F.col("n0") * F.col("s") - 11 * F.col("s0")).alias("iu"),
        (9 * F.col("s0") - 10 * F.col("n0") * F.col("s")).alias("idn"),
    )
    w = _gw().orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = inc.select(
        "d", "s", "s0", "n0",
        F.sum("iu").over(w).alias("pu"),
        F.sum("idn").over(w).alias("pd"),
    )
    cusum = pre.select(
        "d", "s", "s0", "n0",
        (F.col("pu") - F.least(F.min("pu").over(w), F.lit(0))).alias("cu"),
        (F.col("pd") - F.least(F.min("pd").over(w), F.lit(0))).alias("cd"),
    )
    scale = 10.0 * F.col("n0")
    return cusum.select(
        "d",
        F.col("s").alias("revenue"),
        iround(F.col("cu").cast("double") / scale, 4).alias("cusum_up"),
        iround(F.col("cd").cast("double") / scale, 4).alias("cusum_down"),
        (F.col("cu") > 50 * F.col("s0")).cast("bigint").alias("alarm_up"),
        (F.col("cd") > 50 * F.col("s0")).cast("bigint").alias("alarm_down"),
    )


# --- t48: Count-Min heavy-hitter calibration ----------------------------------

_T48_D = 4  # hash rows
_T48_W = 256  # counters per row
_T48_K = 30  # exact top-k tokens probed

_T48_JS = ", ".join(f"({j})" for j in range(_T48_D))


def _t48_sql_bucket(j_expr: str, w_expr: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('cm' || ({j_expr}) || ':' || ({w_expr})), 1, 15)) "
        f"AS BIGINT) % {_T48_W})"
    )


_T48_ORACLE = f"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS w FROM documents
    ),
    exact AS (
      SELECT w, COUNT(*) AS c FROM tok WHERE w <> '' GROUP BY w
    ),
    js AS (SELECT j FROM (VALUES {_T48_JS}) AS t(j)),
    sketch AS (
      SELECT j, {_t48_sql_bucket("j", "w")} AS b, SUM(c) AS cnt
      FROM exact CROSS JOIN js GROUP BY 1, 2
    ),
    topk AS (SELECT w, c FROM exact ORDER BY c DESC, w LIMIT {_T48_K}),
    probe AS (
      SELECT t.w, t.c, s.cnt
      FROM topk t CROSS JOIN js
      JOIN sketch s ON s.j = js.j AND s.b = {_t48_sql_bucket("js.j", "t.w")}
    ),
    est AS (SELECT w, c, MIN(cnt) AS est FROM probe GROUP BY w, c)
    SELECT w AS token,
           CAST(c AS BIGINT) AS true_count,
           CAST(est AS BIGINT) AS est_count,
           CAST(est - c AS BIGINT) AS overestimate,
           {sql_iround("CAST(est AS DOUBLE) / c", 4)} AS err_ratio
    FROM est
"""


@query(
    "t48_countmin_heavy_hitters",
    oracle=_T48_ORACLE,
    tags=("llm", "text", "sketch", "calibration"),
)
def t48_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch calibration for token heavy-hitters: build a
    D×W = {d}×{w} CM sketch over the corpus token stream, probe it for
    the EXACT top-{k} tokens, and report estimated vs true counts. The
    CM guarantee est ≥ true is hash-checked as a theorem (overestimate
    is never negative), and err_ratio measures the collision inflation a
    {w}-counter row actually suffers at each SF — the d18/d19 pattern
    applied to the frequency sketch a streaming pipeline would deploy.

    Determinism: the hash family is seeded md5 (``cm{{j}}:token``), so
    both engines place every token in identical buckets; counters are
    exact integer sums.

    Scale: the token stream collapses to per-token exact counts FIRST
    (one partial-aggregable groupBy — the sketch add is linear, so
    adding c occurrences at once is identical to c streaming updates);
    the sketch build is a second groupBy producing exactly D·W = {dw}
    rows, which then BROADCAST to the probe join. No shuffle is
    corpus-sized except the token count, and that one is map-side
    combined. The eager checkpoint materializes the shared exact-count
    table once (two consumers in one job — the d20 lesson)."""
    t = register(spark, sf_dir, ("documents",))
    toks = t["documents"].select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.col("w") != ""
    )
    exact = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # feeds the sketch AND the top-k probe
    )

    def bucket(j: int, col: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cm{j}:"), col)), 1, 15), 16, 10
            ).cast("long")
            % _T48_W
        )

    jb = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), bucket(j, F.col("w")).alias("b"))
                for j in range(_T48_D)
            ]
        )
    ).alias("jb")
    sketch = (
        exact.select(jb, "c")
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
        .agg(F.sum("c").alias("cnt"))
    )
    topk = exact.orderBy(F.desc("c"), "w").limit(_T48_K)
    probe = topk.select("w", "c", jb).select(
        "w", "c", F.col("jb.j").alias("j"), F.col("jb.b").alias("b")
    )
    est = (
        probe.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("w", "c")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        F.col("w").alias("token"),
        F.col("c").cast("bigint").alias("true_count"),
        F.col("est").cast("bigint").alias("est_count"),
        (F.col("est") - F.col("c")).cast("bigint").alias("overestimate"),
        iround(F.col("est").cast("double") / F.col("c"), 4).alias("err_ratio"),
    )


t48_countmin_heavy_hitters.__doc__ = t48_countmin_heavy_hitters.__doc__.format(
    d=_T48_D, w=_T48_W, k=_T48_K, dw=_T48_D * _T48_W
)


# --- t49: term burstiness (Church–Gale variance-to-mean ratio) --------------

_T49_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), ' +')) AS term
      FROM documents
    ),
    per_doc AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE term <> ''
      GROUP BY term, doc_id
    ),
    stats AS (
      SELECT term,
             CAST(SUM(c) AS BIGINT)     AS total_occ,
             CAST(SUM(c * c) AS BIGINT) AS sum_sq,
             CAST(COUNT(*) AS BIGINT)   AS df
      FROM per_doc
      GROUP BY term
    ),
    top AS (
      SELECT * FROM stats ORDER BY total_occ DESC, term LIMIT 20
    )
    SELECT term, total_occ, df,
           {sql_iround("CAST(total_occ AS DOUBLE) / df", 6)} AS mean_tf,
           {sql_iround(
               "((CAST(sum_sq AS DOUBLE) / df)"
               " - (CAST(total_occ AS DOUBLE) / df) * (CAST(total_occ AS DOUBLE) / df))"
               " / (CAST(total_occ AS DOUBLE) / df)", 6)} AS vmr
    FROM top
    ORDER BY total_occ DESC, term
"""


@query(
    "t49_term_burstiness",
    oracle=_T49_ORACLE,
    tags=("llm", "text", "statistics"),
)
def t49_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness for the 20 highest-frequency terms: the
    variance-to-mean ratio (Church & Gale's dispersion statistic) of
    per-document term counts over the documents that contain the term.
    VMR ≈ 1 is Poisson scatter (function words); VMR ≫ 1 marks bursty,
    topical terms — the statistic curation pipelines use to separate
    glue vocabulary from content vocabulary when building filter lexica
    and mixture diagnostics.

    Scale: ONE token explode feeds a (term, doc) count with map-side
    combine (the shuffle is corpus-token-bounded), then a per-term moment
    aggregation (sum, sum of squares, document frequency — all exact
    BIGINT), a bounded top-k, and the VMR evaluated from the exact
    integer moments in one identical IEEE expression on both engines.
    No per-doc vectors are ever collected; state is O(vocabulary)."""
    t = register(spark, sf_dir, ("documents",))
    tok = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .filter(F.col("term") != "")
    )
    per_doc = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stats = per_doc.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("total_occ"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    top = stats.orderBy(F.desc("total_occ"), "term").limit(20)
    mean = F.col("total_occ").cast("double") / F.col("df")
    vmr = (F.col("sum_sq").cast("double") / F.col("df") - mean * mean) / mean
    return top.select(
        "term",
        "total_occ",
        "df",
        iround(mean, 6).alias("mean_tf"),
        iround(vmr, 6).alias("vmr"),
    ).orderBy(F.desc("total_occ"), "term")
