"""Round-6 additions IV: MIPS-to-cosine reduction, corpus scaling laws,
robust trend estimation, survey-sampling allocation, table-format
right-to-be-forgotten, language-model retrieval, and decode-path image
statistics.

- ``s19`` proves the norm-augmentation reduction (Bachrach et al. 2014)
  that serving stacks use to answer maximum-inner-product queries with a
  cosine ANN index: Spark ranks by the cosine of AUGMENTED vectors, the
  oracle ranks by the raw inner product — hash equality is the theorem.
- ``t41`` measures Heaps' law (vocabulary growth V(n) = k·n^β) over word
  -trigram types using the distributed prefix sum for global token
  positions — no single-partition window touches the corpus.
- ``t42`` is the dual Zipf rank-frequency fit, computed on the
  distinct-frequency table (small by construction) with tie-midranks.
- ``f03`` adds the Theil–Sen robust slope next to f02's OLS — the
  median-of-pairwise-slopes estimator that ignores outlier months.
- ``x04`` is Neyman (optimal) stratified-sampling allocation vs
  proportional, with the design-effect ratio — how a measurement
  pipeline should split a labeling budget across sources.
- ``u08`` drives the txlog table through a GDPR forget flow: merge
  -delete the keys, vacuum the history, and emit the auditable evidence
  (row liveness per version, physical files purged).
- ``r06`` is Dirichlet-smoothed query-likelihood retrieval (Zhai &
  Lafferty), the LM-retrieval baseline next to r01's BM25, sharing the
  same one-explode term-frequency table.
- ``m10`` extracts luminance statistics (mean + byte-entropy) through
  the REAL PNG decode path; the oracle reconstructs both from the
  fixture geometry without a codec (m07's reconstruction discipline).

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl)
has none of these surfaces; beyond-reference LLM-pipeline mandate.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.vector import as_double, dot, norm
from dibimbing_case_study_etl_spark.queries import query

# --- s19: MIPS top-k via norm-augmentation reduction to cosine -------------

_S19_K = 10
_S19_NQ = 10


_S19_ORACLE = f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id, v FROM vecs WHERE vec_id < {_S19_NQ})
    SELECT query_id, neighbor_id, dot_product, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_iround("list_dot_product(q.v, c.v)", 6)} AS dot_product,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v) DESC, c.vec_id
             ) AS INTEGER) AS rank
      FROM q JOIN vecs c ON c.vec_id <> q.vec_id
    ) WHERE rank <= {_S19_K}
"""


@query(
    "s19_mips_norm_reduction_topk",
    oracle=_S19_ORACLE,
    tags=("llm", "similarity", "mips"),
)
def s19_mips_norm_reduction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k via the norm-augmentation reduction:
    corpus vectors map to x̃ = [x/M ; √(1−‖x‖²/M²)] (M = max corpus
    norm), queries to q̃ = [q ; 0], and cos(q̃, x̃) = q·x / (M‖q‖) — so a
    cosine index answers MIPS queries. Spark executes the REDUCED
    problem (ranks by augmented cosine); the oracle ranks by the raw
    inner product. Driver-hash equality between the two IS the
    reduction's correctness proof on this corpus. Ties (exact-clone
    vectors) break by neighbor_id on both sides; distinct corpus dots
    are separated far beyond the ~1e-16 relative wobble the extra
    augmented component introduces, so rank agreement is exact.

    Scale: the query side (10 vectors) broadcasts; the corpus scan
    computes the augmentation inline (one extra array element — the max
    -norm M is a broadcast one-row aggregate); per-query top-k is a
    ranking window with rank≤k pushdown (WindowGroupLimit), never a
    global sort."""
    t = register(spark, sf_dir, ("embeddings",))
    vecs = t["embeddings"].select("vec_id", as_double(F.col("embedding")).alias("v"))
    corpus = vecs.withColumn("nrm", norm(F.col("v")))
    m = F.broadcast(corpus.agg(F.max("nrm").alias("m")))
    aug = corpus.crossJoin(m).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.concat(
            F.transform("v", lambda x: x / F.col("m")),
            F.array(
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        F.lit(1.0) - (F.col("nrm") / F.col("m")) * (F.col("nrm") / F.col("m")),
                    )
                )
            ),
        ).alias("ca"),
    ).withColumn("can", norm(F.col("ca")))
    q = vecs.filter(F.col("vec_id") < _S19_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.concat(F.col("v"), F.array(F.lit(0.0))).alias("qa"),
    ).withColumn("qan", norm(F.col("qa")))
    scored = aug.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qa"), F.col("ca")) / (F.col("qan") * F.col("can"))).alias("aug_cos"),
        dot(F.col("qv"), F.col("cv")).alias("dp"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("aug_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _S19_K)
        .select(
            "query_id",
            "neighbor_id",
            iround(F.col("dp"), 6).alias("dot_product"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- f03: Theil–Sen robust trend vs OLS on monthly revenue -----------------


_F03_ORACLE = f"""
    WITH series AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
             CAST(SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY m
    ),
    rel AS (
      SELECT m - (SELECT MIN(m) FROM series) AS m, cents FROM series
    ),
    slopes AS (
      SELECT a.m AS ma, b.m AS mb,
             (CAST(b.cents AS DOUBLE) - a.cents) / (b.m - a.m) AS s
      FROM rel a JOIN rel b ON b.m > a.m
    ),
    med_s AS (
      SELECT s AS theil FROM (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s, ma, mb) AS rn,
               COUNT(*) OVER () AS n
        FROM slopes
      ) WHERE rn = (n + 1) // 2
    ),
    med_i AS (
      SELECT r AS icept FROM (
        SELECT rel.cents - med_s.theil * rel.m AS r,
               ROW_NUMBER() OVER (ORDER BY rel.cents - med_s.theil * rel.m, rel.m) AS rn,
               COUNT(*) OVER () AS n
        FROM rel CROSS JOIN med_s
      ) WHERE rn = (n + 1) // 2
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS sx,
             CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(m * cents) AS BIGINT) AS sxy,
             CAST(SUM(m * m) AS BIGINT) AS sxx
      FROM rel
    )
    SELECT sums.n AS n_months,
           CAST((SELECT COUNT(*) FROM slopes) AS BIGINT) AS n_pairs,
           {sql_iround("med_s.theil", 4)} AS theil_slope,
           {sql_iround("med_i.icept", 2)} AS theil_intercept,
           {sql_iround(
               "(sums.n * CAST(sums.sxy AS DOUBLE) - CAST(sums.sx AS DOUBLE) * sums.sy)"
               " / (sums.n * CAST(sums.sxx AS DOUBLE) - CAST(sums.sx AS DOUBLE) * sums.sx)",
               4,
           )} AS ols_slope
    FROM sums CROSS JOIN med_s CROSS JOIN med_i
"""


@query(
    "f03_theil_sen_trend",
    oracle=_F03_ORACLE,
    tags=("forecast", "regression", "robust"),
)
def f03_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue next to the OLS slope
    (f02's estimator): the median of all pairwise slopes, insensitive to
    ~29% outlier months where OLS is not. Medians use the deterministic
    lower-median rule (row (n+1)÷2 in (value, key) order) so both
    engines select the identical element — no interpolation floats.

    Scale: the corpus-sized work is ONE month-keyed partial aggregation
    (exact cents). The pairwise-slope table is month-pairs — bounded by
    the calendar (~84 months → ≤3.5k pairs at ANY corpus size), so the
    ranking windows run on a model-sized table, never on data."""
    t = register(spark, sf_dir, ("orders",))
    series = (
        t["orders"]
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("m")
        )
        .agg(
            F.sum(F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    m0 = F.broadcast(series.agg(F.min("m").alias("m0")))
    rel = series.crossJoin(m0).select(
        (F.col("m") - F.col("m0")).alias("m"), "cents"
    ).localCheckpoint(eager=False)  # model-sized; feeds 3 consumers
    a = rel.select(F.col("m").alias("ma"), F.col("cents").alias("ca"))
    b = rel.select(F.col("m").alias("mb"), F.col("cents").alias("cb"))
    slopes = (
        a.join(F.broadcast(b), F.col("mb") > F.col("ma"))
        .select(
            "ma",
            "mb",
            ((F.col("cb").cast("double") - F.col("ca")) / (F.col("mb") - F.col("ma"))).alias("s"),
        )
    )
    ws = W.orderBy("s", "ma", "mb")
    med_s = F.broadcast(
        slopes.select(
            "s",
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("s").alias("theil"), F.col("n").cast("bigint").alias("n_pairs"))
    )
    wi = W.orderBy("r", "m")
    med_i = F.broadcast(
        rel.crossJoin(med_s.select("theil"))
        .select((F.col("cents") - F.col("theil") * F.col("m")).alias("r"), "m")
        .select(
            "r",
            F.row_number().over(wi).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("r").alias("icept"))
    )
    sums = F.broadcast(
        rel.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("m").cast("bigint").alias("sx"),
            F.sum("cents").cast("bigint").alias("sy"),
            F.sum(F.col("m") * F.col("cents")).cast("bigint").alias("sxy"),
            F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sxx"),
        )
    )
    ols = (
        (F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
    )
    return (
        sums.crossJoin(med_s)
        .crossJoin(med_i)
        .select(
            F.col("n").alias("n_months"),
            F.col("n_pairs").alias("n_pairs"),
            iround(F.col("theil"), 4).alias("theil_slope"),
            iround(F.col("icept").cast("double"), 2).alias("theil_intercept"),
            iround(ols, 4).alias("ols_slope"),
        )
    )


# --- x04: Neyman stratified-sampling allocation ----------------------------

_X04_BUDGET = 1000


_X04_ORACLE = f"""
    WITH strata AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, n_rows, sx, sxx,
             sqrt((n_rows * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
               / n_rows AS sigma
      FROM strata
    ),
    scaled AS (
      SELECT source, n_rows, sigma,
             CAST(round_even(n_rows * sigma * 100, 0) AS BIGINT) AS ns100,
             CAST(round_even(n_rows * sigma * sigma * 100, 0) AS BIGINT) AS nv100
      FROM sd
    ),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS nn,
             CAST(SUM(ns100) AS BIGINT) AS w,
             CAST(SUM(nv100) AS BIGINT) AS v
      FROM scaled
    )
    SELECT s.source, s.n_rows,
           {sql_iround("s.sigma", 6)} AS sd_chars,
           CAST(round_even({_X04_BUDGET} * CAST(s.ns100 AS DOUBLE) / t.w, 0) AS BIGINT)
             AS alloc_neyman,
           CAST(round_even({_X04_BUDGET} * CAST(s.n_rows AS DOUBLE) / t.nn, 0) AS BIGINT)
             AS alloc_prop,
           {sql_iround(
               f"((CAST(t.w AS DOUBLE) / 100 / t.nn) * (CAST(t.w AS DOUBLE) / 100 / t.nn))"
               f" / {_X04_BUDGET}",
               6,
           )} AS var_neyman,
           {sql_iround(f"(CAST(t.v AS DOUBLE) / 100 / t.nn) / {_X04_BUDGET}", 6)}
             AS var_prop,
           {sql_iround(
               "((CAST(t.w AS DOUBLE) / 100 / t.nn) * (CAST(t.w AS DOUBLE) / 100 / t.nn))"
               " / ((CAST(t.v AS DOUBLE) / 100 / t.nn))",
               6,
           )} AS design_effect
    FROM scaled s CROSS JOIN tot t
    ORDER BY s.source
"""


@query(
    "x04_neyman_allocation",
    oracle=_X04_ORACLE,
    tags=("experimentation", "sampling"),
)
def x04_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation for estimating mean
    document length under a fixed labeling budget: n_h ∝ N_h·σ_h (big
    AND variable strata get budget) vs proportional n_h ∝ N_h, with both
    designs' estimator variances and their ratio (the design effect —
    how much precision Neyman buys). The per-stratum N_h·σ_h terms round
    to scaled BIGINT before the cross-strata sums, so no
    accumulation-order float reaches the driver hash (x01's CUPED
    discipline applied to survey design).

    Scale: one corpus scan → per-source partial aggregation of exact
    (n, Σx, Σx²); everything downstream runs on the |sources|-row
    table and one broadcast total."""
    t = register(spark, sf_dir, ("documents",))
    strata = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
        )
    )
    sigma = (
        F.sqrt(
            F.col("n_rows") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        / F.col("n_rows")
    )
    scaled = strata.select(
        "source",
        "n_rows",
        sigma.alias("sigma"),
        F.call_function("rint", F.col("n_rows") * sigma * 100).cast("bigint").alias("ns100"),
        F.call_function("rint", F.col("n_rows") * sigma * sigma * 100)
        .cast("bigint")
        .alias("nv100"),
    )
    tot = F.broadcast(
        scaled.agg(
            F.sum("n_rows").cast("bigint").alias("nn"),
            F.sum("ns100").cast("bigint").alias("w"),
            F.sum("nv100").cast("bigint").alias("v"),
        )
    )
    mean_sd = F.col("w").cast("double") / 100 / F.col("nn")  # Σ N_h σ_h / N
    var_neyman = mean_sd * mean_sd / _X04_BUDGET
    var_prop = (F.col("v").cast("double") / 100 / F.col("nn")) / _X04_BUDGET
    return (
        scaled.crossJoin(tot)
        .select(
            "source",
            "n_rows",
            iround(F.col("sigma"), 6).alias("sd_chars"),
            F.call_function(
                "rint", _X04_BUDGET * F.col("ns100").cast("double") / F.col("w")
            )
            .cast("bigint")
            .alias("alloc_neyman"),
            F.call_function(
                "rint", _X04_BUDGET * F.col("n_rows").cast("double") / F.col("nn")
            )
            .cast("bigint")
            .alias("alloc_prop"),
            iround(var_neyman, 6).alias("var_neyman"),
            iround(var_prop, 6).alias("var_prop"),
            iround(mean_sd * mean_sd / (F.col("v").cast("double") / 100 / F.col("nn")), 6).alias(
                "design_effect"
            ),
        )
        .orderBy("source")
    )


# --- t41: Heaps'-law vocabulary growth over trigram types ------------------

_T41_SCL = 1_000_000


_T41_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    g AS (SELECT doc_id, greatest(len(w) - 2, 0) AS gl, w FROM d),
    st AS (
      SELECT doc_id, gl, w,
             SUM(gl) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - gl
               AS strt
      FROM g
    ),
    grams AS (
      SELECT strt + i AS pos, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      FROM (SELECT strt, w, unnest(generate_series(1, CAST(gl AS BIGINT))) AS i
            FROM st)
    ),
    fo AS (SELECT gram, CAST(MIN(pos) AS BIGINT) AS fo FROM grams GROUP BY gram),
    nn AS (SELECT CAST(SUM(gl) AS BIGINT) AS nn FROM g),
    ck AS (
      SELECT d, (nn.nn * d) // 10 AS n_d
      FROM (SELECT unnest(generate_series(1, 10)) AS d) CROSS JOIN nn
    ),
    v AS (
      SELECT ck.d, ck.n_d, CAST(COUNT(*) AS BIGINT) AS vocab
      FROM ck JOIN fo ON fo.fo <= ck.n_d
      GROUP BY ck.d, ck.n_d
    ),
    pts AS (
      SELECT d, n_d, vocab,
             CAST(round_even(ln(n_d) * {_T41_SCL}, 0) AS BIGINT) AS x,
             CAST(round_even(ln(vocab) * {_T41_SCL}, 0) AS BIGINT) AS y
      FROM v
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    ),
    fit AS (
      SELECT CAST((m * sxy - sx * sy) AS DOUBLE)
               / CAST((m * sxx - sx * sx) AS DOUBLE) AS beta,
             m, sx, sy
      FROM s
    )
    SELECT CAST(pts.d AS INTEGER) AS decile, pts.n_d AS n_prefix_grams,
           pts.vocab AS vocab_size,
           {sql_iround("fit.beta", 4)} AS heaps_beta,
           {sql_iround(
               f"(CAST(fit.sy AS DOUBLE) / {_T41_SCL}"
               f" - fit.beta * CAST(fit.sx AS DOUBLE) / {_T41_SCL}) / fit.m",
               4,
           )} AS heaps_lnk
    FROM pts CROSS JOIN fit
    ORDER BY decile
"""


@query(
    "t41_heaps_vocab_growth",
    oracle=_T41_ORACLE,
    tags=("llm", "text", "scaling-law"),
)
def t41_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth V(n) = k·n^β measured over word
    -trigram types: the curve that predicts how many NEW n-gram types
    the next shard of corpus will contribute (dedup cost, vocab sizing,
    novelty forecasting all key off β). Every trigram occurrence gets a
    GLOBAL position via the distributed prefix sum over per-document
    gram counts (no single-partition window ever sees the corpus); a
    type's first-occurrence position is a plain MIN; V at each corpus
    decile counts first-occurrences at or before the cut. The log-log
    OLS fit runs on ten scaled-integer points, so the fitted (β, ln k)
    are accumulation-order-free.

    Scale: prefix sum = bounded driver state (one offset per bucket);
    first-occurrence table is vocabulary-sized; the decile join is
    |vocab|×10. The corpus is scanned twice (gram counts, gram
    explode), shuffled once (gram-keyed MIN)."""
    from dibimbing_case_study_etl_spark.functions.text import word_ngrams
    from dibimbing_case_study_etl_spark.operators.packing import prefix_sum

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    gl = F.greatest(F.size(word_ngrams(F.col("text"), 3)), F.lit(0)).cast("bigint")
    counts = docs.select("doc_id", gl.alias("gl"))
    started = prefix_sum(counts, "gl", ["doc_id"], out_col="cum").select(
        "doc_id", (F.col("cum") - F.col("gl")).alias("strt")
    )
    grams = (
        docs.select("doc_id", F.posexplode(word_ngrams(F.col("text"), 3)).alias("i", "gram"))
        .join(started, "doc_id")
        .select((F.col("strt") + F.col("i") + 1).alias("pos"), "gram")
    )
    fo = grams.groupBy("gram").agg(F.min("pos").cast("bigint").alias("fo"))
    nn = F.broadcast(counts.agg(F.sum("gl").cast("bigint").alias("nn")))
    ck = (
        spark.range(1, 11)
        .select(F.col("id").alias("d"))
        .crossJoin(nn)
        .select("d", F.expr("(nn * d) div 10").cast("bigint").alias("n_d"))
    )
    v = (
        fo.crossJoin(F.broadcast(ck))
        .filter(F.col("fo") <= F.col("n_d"))
        .groupBy("d", "n_d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    pts = v.select(
        "d",
        "n_d",
        "vocab",
        F.call_function("rint", F.log(F.col("n_d")) * _T41_SCL).cast("bigint").alias("x"),
        F.call_function("rint", F.log(F.col("vocab")) * _T41_SCL).cast("bigint").alias("y"),
    ).localCheckpoint(eager=False)  # 10 rows; feeds the fit AND the output
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    fit = F.broadcast(
        s.select(
            (
                (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            ).alias("beta"),
            "m",
            "sx",
            "sy",
        )
    )
    return (
        pts.crossJoin(fit)
        .select(
            F.col("d").cast("int").alias("decile"),
            F.col("n_d").alias("n_prefix_grams"),
            F.col("vocab").alias("vocab_size"),
            iround(F.col("beta"), 4).alias("heaps_beta"),
            iround(
                (
                    F.col("sy").cast("double") / _T41_SCL
                    - F.col("beta") * F.col("sx").cast("double") / _T41_SCL
                )
                / F.col("m"),
                4,
            ).alias("heaps_lnk"),
        )
        .orderBy("decile")
    )


# --- t42: Zipf rank-frequency fit over trigram types -----------------------

_T42_FIT = 64  # distinct frequency values entering the fit
_T42_SHOW = 20  # rows returned
_T42_SCL = 1_000_000


_T42_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    grams AS (
      SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
      FROM (SELECT w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
            FROM d)
    ),
    freq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS f FROM grams GROUP BY gram),
    byf AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS m FROM freq GROUP BY f),
    top AS (
      SELECT f, m,
             COALESCE(SUM(m) OVER (ORDER BY f DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             ROW_NUMBER() OVER (ORDER BY f DESC) AS pos
      FROM byf
    ),
    pts AS (
      SELECT pos, f, m, cum_before + (m + 1) / 2.0 AS midrank,
             CAST(round_even(ln(cum_before + (m + 1) / 2.0) * {_T42_SCL}, 0) AS BIGINT) AS x,
             CAST(round_even(ln(f) * {_T42_SCL}, 0) AS BIGINT) AS y
      FROM top WHERE pos <= {_T42_FIT}
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    ),
    fit AS (
      SELECT CAST((m * sxy - sx * sy) AS DOUBLE)
               / CAST((m * sxx - sx * sx) AS DOUBLE) AS slope
      FROM s
    )
    SELECT CAST(pts.pos AS INTEGER) AS pos, pts.f AS freq, pts.m AS n_types,
           {sql_iround("pts.midrank", 2)} AS midrank,
           {sql_iround("fit.slope", 4)} AS zipf_slope
    FROM pts CROSS JOIN fit
    WHERE pts.pos <= {_T42_SHOW}
    ORDER BY pos
"""


@query(
    "t42_zipf_rank_frequency",
    oracle=_T42_ORACLE,
    tags=("llm", "text", "scaling-law"),
)
def t42_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over word-trigram types (Heaps' dual,
    t41): log-frequency against log-midrank, slope ≈ −1/zipf-exponent.
    The fit runs on the DISTINCT-FREQUENCY table — (frequency value,
    type count) pairs with tie-midranks — never on per-type ranks: the
    distinct-frequency table is tiny by construction (≲√Σf values), so
    the cumulative-rank window and the top-{fit} selection are
    model-sized no matter the corpus. Per-point log terms round to
    scaled BIGINT before the regression sums (order-free fit).

    Scale: one gram explode → gram-keyed count (partial agg), then a
    second |vocab|-sized agg by frequency value; everything after runs
    on ≤{fit} rows."""
    from dibimbing_case_study_etl_spark.functions.text import word_ngrams

    t = register(spark, sf_dir, ("documents",))
    grams = t["documents"].select(
        F.explode(word_ngrams(F.col("text"), 3)).alias("gram")
    )
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    byf = freq.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    wdesc = W.orderBy(F.desc("f"))
    top = byf.select(
        "f",
        "m",
        F.coalesce(
            F.sum("m").over(wdesc.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("cum_before"),
        F.row_number().over(wdesc).alias("pos"),
    ).filter(F.col("pos") <= _T42_FIT)
    midrank = F.col("cum_before") + (F.col("m") + 1) / 2.0
    pts = top.select(
        "pos",
        "f",
        "m",
        midrank.alias("midrank"),
        F.call_function("rint", F.log(midrank) * _T42_SCL).cast("bigint").alias("x"),
        F.call_function("rint", F.log("f") * _T42_SCL).cast("bigint").alias("y"),
    ).localCheckpoint(eager=False)  # ≤64 rows; feeds fit AND output
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    fit = F.broadcast(
        s.select(
            (
                (F.col("m_") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("m_") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            ).alias("slope")
        )
    )
    return (
        pts.filter(F.col("pos") <= _T42_SHOW)
        .crossJoin(fit)
        .select(
            F.col("pos").cast("int").alias("pos"),
            F.col("f").alias("freq"),
            F.col("m").alias("n_types"),
            iround(F.col("midrank"), 2).alias("midrank"),
            iround(F.col("slope"), 4).alias("zipf_slope"),
        )
        .orderBy("pos")
    )


t41_heaps_vocab_growth.__doc__ = t41_heaps_vocab_growth.__doc__
t42_zipf_rank_frequency.__doc__ = t42_zipf_rank_frequency.__doc__.format(fit=_T42_FIT)


# --- r06: Dirichlet-smoothed query-likelihood retrieval --------------------

_R06_MU = 2000
_R06_TOPK = 50


def _r06_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import _BM25_TERMS

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    mu = f"CAST({_R06_MU} AS DOUBLE)"
    return f"""
    WITH d AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), ' +')) AS dl
      FROM documents
    ),
    stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS c FROM d),
    tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE tok IN ({terms}) GROUP BY doc_id, tok
    ),
    cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY tok),
    kk AS (
      SELECT CAST(SUM(CAST(round_even(
               ln({mu} * cf.cf / s.c) * 1000000, 0) AS BIGINT)) AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS nq
      FROM cf CROSS JOIN stats s
    ),
    corr AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(round_even(
               ln((tf.tf + {mu} * cf.cf / s.c) / ({mu} * cf.cf / s.c))
               * 1000000, 0) AS BIGINT)) AS BIGINT) AS corr,
             CAST(COUNT(*) AS BIGINT) AS n_match
      FROM tf JOIN cf ON cf.tok = tf.tok CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT d.doc_id,
             COALESCE(corr.corr, 0) + kk.k
               - kk.nq * CAST(round_even(ln(d.dl + {mu}) * 1000000, 0) AS BIGINT)
               AS ss,
             COALESCE(corr.n_match, 0) AS n_match
      FROM d LEFT JOIN corr ON corr.doc_id = d.doc_id CROSS JOIN kk
    )
    SELECT doc_id, n_match AS n_match_terms, ss / 1000000.0 AS score
    FROM scored ORDER BY ss DESC, doc_id LIMIT {_R06_TOPK}
    """


@query(
    "r06_query_likelihood_topk",
    oracle=_r06_oracle(),
    tags=("llm", "retrieval", "text"),
)
def r06_query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty) —
    the language-modeling baseline next to r01's BM25: score(d) =
    Σ_t ln((tf + μ·cf_t/|C|) / (dl + μ)), μ={mu}. The sum decomposes
    into per-MATCH corrections plus a per-document length penalty plus a
    query constant, so only query-term occurrences (r01's shared
    one-explode tf table) ever shuffle; documents matching NO term still
    score (pure smoothing mass) — the LM property BM25 lacks.

    Scale: the tf table is term-filtered at the explode; cf is a
    |terms|-row broadcast; the per-doc score is one length scan + one
    left join; every log term rounds to scaled BIGINT before summation
    (order-free); top-k compiles to TakeOrderedAndProject."""
    from dibimbing_case_study_etl_spark.functions.text import token_count
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import bm25_term_freq

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    d = docs.select("doc_id", token_count(F.col("text")).alias("dl"))
    stats = F.broadcast(d.agg(F.sum("dl").cast("bigint").alias("c")))
    tf = bm25_term_freq(docs).localCheckpoint(eager=False)  # feeds cf AND corr
    cf = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("cf"))
    mu = F.lit(float(_R06_MU))
    p = mu * F.col("cf") / F.col("c")
    kk = F.broadcast(
        cf.crossJoin(stats)
        .select(
            F.call_function("rint", F.log(p) * 1_000_000).cast("bigint").alias("t"),
        )
        .agg(
            F.sum("t").cast("bigint").alias("k"),
            F.count(F.lit(1)).cast("bigint").alias("nq"),
        )
    )
    corr = (
        tf.join(F.broadcast(cf), "tok")
        .crossJoin(stats)
        .select(
            "doc_id",
            F.call_function("rint", F.log((F.col("tf") + p) / p) * 1_000_000)
            .cast("bigint")
            .alias("t"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("t").cast("bigint").alias("corr"),
            F.count(F.lit(1)).cast("bigint").alias("n_match"),
        )
    )
    scored = (
        d.join(corr, "doc_id", "left")
        .crossJoin(kk)
        .select(
            "doc_id",
            (
                F.coalesce(F.col("corr"), F.lit(0))
                + F.col("k")
                - F.col("nq")
                * F.call_function("rint", F.log(F.col("dl") + mu) * 1_000_000).cast(
                    "bigint"
                )
            ).alias("ss"),
            F.coalesce(F.col("n_match"), F.lit(0)).cast("bigint").alias("n_match_terms"),
        )
    )
    return (
        scored.select(
            "doc_id", "n_match_terms", (F.col("ss") / 1_000_000.0).alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_R06_TOPK)
    )


r06_query_likelihood_topk.__doc__ = r06_query_likelihood_topk.__doc__.format(
    mu=_R06_MU
)


# --- u08: right-to-be-forgotten audit on the txlog table format ------------


_U08_ORACLE = """
    WITH c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderkey % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f
      FROM orders
    )
    SELECT phase, version, n_rows, n_forget_rows, readable, historical_files_on_disk
    FROM (
      SELECT 'pre_vacuum' AS phase, CAST(0 AS BIGINT) AS version,
             n AS n_rows, f AS n_forget_rows, TRUE AS readable,
             TRUE AS historical_files_on_disk
      FROM c
      UNION ALL
      SELECT 'pre_vacuum', CAST(1 AS BIGINT), n - f, CAST(0 AS BIGINT), TRUE, TRUE
      FROM c
      UNION ALL
      SELECT 'post_vacuum', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             FALSE, FALSE
      FROM c
      UNION ALL
      SELECT 'post_vacuum', CAST(1 AS BIGINT), n - f, CAST(0 AS BIGINT), TRUE, FALSE
      FROM c
    )
    ORDER BY phase, version
"""


@query(
    "u08_txlog_forget_audit",
    oracle=_U08_ORACLE,
    tags=("warehouse", "acid", "gdpr"),
)
def u08_txlog_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten on the commit-log table format, with
    the audit evidence a compliance review asks for: (1) the forget set
    (keys ≡ 3 mod 10) is removed by a copy-on-write merge-delete; (2)
    ``vacuum`` retaining only the tip PHYSICALLY deletes every file the
    tip does not reference — afterwards no historical data file remains
    on disk (the COW rewrite guarantees every file that ever held a
    forgotten row was replaced, so the purge covers them all); (3) time
    travel to v0 is attempted and REFUSED (readable=false) — history
    containing the forgotten rows is not just hidden but gone. The
    oracle reconstructs the audit table (row liveness per version,
    readability, physical-history presence) from the source data. File
    COUNTS are deliberately absent: ``target_files`` is a cap, not a
    contract, so counts are size-dependent while these facts are not.

    Scale: the audit's data passes are the table's own reads (format
    -native, stats-pruned); purge evidence is a manifest-vs-disk set
    difference, O(files) driver work, no data scan."""
    from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable

    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="txlog_u08_")
    rows = []
    try:
        table = TxLogTable.create(root)
        table.append(o, key_col="k", target_files=4)
        table.merge(spark, o.filter(F.col("k") % 10 == 3), "k", delete=True, target_files=4)

        def historical_on_disk() -> bool:
            import pathlib

            tip = {f.path for f in table.live_files()}
            on_disk = {
                f"{sub.name}/{p.name}"
                for sub in pathlib.Path(root).glob("data-*/")
                for p in sub.glob("*.parquet")
            }
            return bool(on_disk - tip)

        def audit(phase: str, version: int) -> None:
            hist = historical_on_disk()
            try:
                df = table.read(spark, as_of=version)
                n = df.count()
                nf = df.filter(F.col("k") % 10 == 3).count()
                readable = True
            except Exception:
                n, nf, readable = 0, 0, False
            rows.append((phase, version, n, nf, readable, hist))

        audit("pre_vacuum", 0)
        audit("pre_vacuum", 1)
        table.vacuum(as_of_retained=1)
        audit("post_vacuum", 0)
        audit("post_vacuum", 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        schema=(
            "phase string, version bigint, n_rows bigint, n_forget_rows bigint,"
            " readable boolean, historical_files_on_disk boolean"
        ),
    )
    return out.orderBy("phase", "version")


# --- m10: luminance statistics through the REAL PNG decode path ------------


_M10_ORACLE = f"""
    WITH geom AS (
      SELECT doc_id, text,
             CAST(length(text) AS BIGINT) AS len,
             CAST((8 + doc_id % 9) * (8 + (doc_id * 3) % 9) AS BIGINT) AS n
      FROM documents WHERE n_chars > 0
    ),
    counts AS (
      SELECT doc_id, n, unicode(substr(text, CAST(j AS INT) + 1, 1)) AS lum,
             CAST(SUM((n - 1 - j) // len + 1) AS BIGINT) AS cnt
      FROM (SELECT doc_id, text, len, n,
                   unnest(generate_series(0, CAST(len - 1 AS BIGINT))) AS j
            FROM geom)
      WHERE j < n
      GROUP BY doc_id, n, lum
    ),
    ent AS (
      SELECT doc_id, n,
             CAST(SUM(lum * cnt) AS BIGINT) AS px_sum,
             CAST(SUM(CAST(round_even(
               -(CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)
               * 1000000000, 0) AS BIGINT)) AS BIGINT) AS e9
      FROM counts GROUP BY doc_id, n
    )
    SELECT doc_id, n AS n_pixels,
           {sql_iround("CAST(px_sum AS DOUBLE) / n", 4)} AS mean_lum,
           {sql_iround("(e9 / 1000000000.0) / ln(2.0)", 6)} AS entropy_bits
    FROM ent
"""


@query(
    "m10_image_luminance_stats",
    oracle=_M10_ORACLE,
    tags=("llm", "multimodal", "decode"),
)
def m10_image_luminance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image luminance statistics (mean + Shannon entropy of the
    pixel-value distribution) computed through the REAL codec: render
    each document to a spec-valid greyscale PNG, decode it back
    (Pillow or the built-in subset decoder), and emit per-(image, value)
    pixel counts from the decoded array — the Python kernel returns only
    EXACT integers; all transcendental arithmetic (ln for the entropy)
    runs JVM-side where cross-engine bit-parity with DuckDB's ``ln`` is
    established. The oracle reconstructs the same histogram from the
    fixture geometry (pixels tile the UTF-8 text), never touching a
    codec — so a decoder that dropped, duplicated, or reordered bytes
    would hash-mismatch.

    Scale: one Arrow-batched decode pass emitting ≤|alphabet| count rows
    per image (not pixels); the entropy is a doc-keyed partial agg with
    scaled-int rounding per value row (order-free)."""
    import pandas as pd

    from dibimbing_case_study_etl_spark.functions.imaging import decode_image
    from dibimbing_case_study_etl_spark.operators.multimodal import synth_png_table

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].filter(F.col("n_chars") > 0)
    pngs = synth_png_table(docs, "doc_id", "text")

    def lum_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, lums, cnts = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                px = decode_image(bytes(blob)).reshape(-1)
                vals, counts = np.unique(px, return_counts=True)
                ids.extend([int(doc_id)] * len(vals))
                lums.extend(int(v) for v in vals)
                cnts.extend(int(c) for c in counts)
            yield pd.DataFrame({"doc_id": ids, "lum": lums, "cnt": cnts})

    counted = pngs.select("doc_id", "content").mapInPandas(
        lum_counts, schema="doc_id bigint, lum bigint, cnt bigint"
    )
    n = ((8 + F.col("doc_id") % 9) * (8 + (F.col("doc_id") * 3) % 9)).cast("bigint")
    p = F.col("cnt").cast("double") / F.col("n")
    return (
        counted.withColumn("n", n)
        .groupBy("doc_id", "n")
        .agg(
            F.sum(F.col("lum") * F.col("cnt")).cast("bigint").alias("px_sum"),
            F.sum(
                F.call_function("rint", -p * F.log(p) * 1_000_000_000).cast("bigint")
            )
            .cast("bigint")
            .alias("e9"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_pixels"),
            iround(F.col("px_sum").cast("double") / F.col("n"), 4).alias("mean_lum"),
            iround((F.col("e9") / 1_000_000_000.0) / F.lit(0.6931471805599453), 6).alias(
                "entropy_bits"
            ),
        )
    )
