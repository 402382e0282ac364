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
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
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
    ws = _gw().orderBy("s", "ma", "mb")
    med_s = F.broadcast(
        slopes.select(
            "s",
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("s").alias("theil"), F.col("n").cast("bigint").alias("n_pairs"))
    )
    wi = _gw().orderBy("r", "m")
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
    wdesc = _gw().orderBy(F.desc("f"))
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
        table.vacuum(as_of_retained=1, min_file_age_s=0)  # single-writer query: quiescent
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


# --- x05: mSPRT always-valid sequential A/B monitoring ----------------------

_X05_DECILES = 10


_X05_ORACLE = f"""
    WITH p AS (
      SELECT user_id % 2 AS variant, epoch_us(ts) AS us,
             CAST(round_even(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    bounds AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM p),
    bucketed AS (
      SELECT LEAST({_X05_DECILES}, ((us - b.lo) * {_X05_DECILES}) // (b.hi - b.lo) + 1)
               AS bkt,
             variant, cents
      FROM p CROSS JOIN bounds b
    ),
    part AS (
      SELECT bkt, variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM bucketed GROUP BY bkt, variant
    ),
    grid AS (
      SELECT d, v FROM (SELECT unnest(generate_series(1, {_X05_DECILES})) AS d)
      CROSS JOIN (SELECT unnest([0, 1]) AS v)
    ),
    cum AS (
      SELECT g.d, g.v,
             CAST(SUM(COALESCE(part.n, 0)) AS BIGINT) AS n,
             CAST(SUM(COALESCE(part.s, 0)) AS BIGINT) AS s,
             CAST(SUM(COALESCE(part.ss, 0)) AS BIGINT) AS ss
      FROM grid g
      LEFT JOIN part ON part.variant = g.v AND part.bkt <= g.d
      GROUP BY g.d, g.v
    ),
    wide AS (
      SELECT d,
             MAX(CASE WHEN v = 1 THEN n END) AS n1,
             MAX(CASE WHEN v = 1 THEN s END) AS s1,
             MAX(CASE WHEN v = 0 THEN n END) AS n0,
             MAX(CASE WHEN v = 0 THEN s END) AS s0,
             CAST(SUM(n) AS BIGINT) AS np,
             CAST(SUM(s) AS BIGINT) AS sp,
             CAST(SUM(ss) AS BIGINT) AS ssp
      FROM cum GROUP BY d
    ),
    stats AS (
      SELECT d, n1, n0,
             (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) / 100 AS delta,
             ((CAST(ssp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / np) / np)
               * (1.0 / n1 + 1.0 / n0) / 10000 AS se2,
             ((CAST(ssp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / np) / np) / 10000
               AS tau2
      FROM wide
      WHERE n1 > 0 AND n0 > 0
    ),
    lam AS (
      SELECT d, n1, n0, delta,
             0.5 * ln(se2 / (se2 + tau2))
               + delta * delta * tau2 / (2 * se2 * (se2 + tau2)) AS log_lambda
      FROM stats WHERE se2 > 0
    )
    SELECT CAST(d AS INTEGER) AS decile, n1 AS n_treat, n0 AS n_ctrl,
           {sql_iround("delta", 4)} AS delta,
           {sql_iround("log_lambda", 6)} AS log_lambda,
           {sql_iround(
               "MIN(LEAST(1.0, exp(-log_lambda)))"
               " OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
               6,
           )} AS p_always_valid
    FROM lam
    ORDER BY decile
"""


@query(
    "x05_msprt_sequential_test",
    oracle=_X05_ORACLE,
    tags=("experimentation", "sequential", "events"),
)
def x05_msprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring (mSPRT, Johari et al.): the
    mixture likelihood ratio Λ_n for the purchase-value difference is
    evaluated at ten experiment-timeline checkpoints, with the
    always-valid p-value p_n = min over checkpoints of 1/Λ — the number
    a dashboard may show CONTINUOUSLY without peeking-inflated false
    positives (x02 guards assignment, x03 sizes the experiment, x01
    reads it out once; this is the monitor while it runs). Mixture
    variance τ² = pooled σ̂² (the standard self-scaled choice); Λ is
    closed-form normal-mixture, reported in log space.

    Scale: each event maps to its FIRST uncovered checkpoint (integer
    bucket arithmetic) and is aggregated once — the cumulative-by
    -checkpoint table is built by a ≤10×2-row window, never by
    rescanning events per checkpoint; all sums are exact BIGINT cents."""
    t = register(spark, sf_dir, ("events",))
    p = t["events"].filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("variant"),
        F.unix_micros("ts").alias("us"),
        F.call_function("rint", F.col("value") * 100).cast("bigint").alias("cents"),
    )
    bounds = F.broadcast(p.agg(F.min("us").alias("lo"), F.max("us").alias("hi")))
    bucketed = p.crossJoin(bounds).select(
        F.least(
            F.lit(_X05_DECILES),
            F.expr(f"((us - lo) * {_X05_DECILES}) div (hi - lo)") + 1,
        ).alias("bkt"),
        "variant",
        "cents",
    )
    part = bucketed.groupBy("bkt", "variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    grid = (
        spark.range(1, _X05_DECILES + 1)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(2).select(F.col("id").alias("v")))
    )
    cum = (
        grid.join(
            part, (part["variant"] == F.col("v")) & (part["bkt"] <= F.col("d")), "left"
        )
        .groupBy("d", "v")
        .agg(
            F.sum(F.coalesce("n", F.lit(0))).cast("bigint").alias("n"),
            F.sum(F.coalesce("s", F.lit(0))).cast("bigint").alias("s"),
            F.sum(F.coalesce("ss", F.lit(0))).cast("bigint").alias("ss"),
        )
    )
    wide = cum.groupBy("d").agg(
        F.max(F.when(F.col("v") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("v") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("v") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("v") == 0, F.col("s"))).alias("s0"),
        F.sum("n").cast("bigint").alias("np"),
        F.sum("s").cast("bigint").alias("sp"),
        F.sum("ss").cast("bigint").alias("ssp"),
    )
    pooled_var = (
        (F.col("ssp").cast("double") - F.col("sp").cast("double") * F.col("sp") / F.col("np"))
        / F.col("np")
    )
    stats = wide.filter((F.col("n1") > 0) & (F.col("n0") > 0)).select(
        "d",
        "n1",
        "n0",
        ((F.col("s1").cast("double") / F.col("n1") - F.col("s0").cast("double") / F.col("n0")) / 100).alias("delta"),
        (pooled_var * (1.0 / F.col("n1") + 1.0 / F.col("n0")) / 10000).alias("se2"),
        (pooled_var / 10000).alias("tau2"),
    )
    log_lambda = 0.5 * F.log(F.col("se2") / (F.col("se2") + F.col("tau2"))) + (
        F.col("delta") * F.col("delta") * F.col("tau2")
        / (2 * F.col("se2") * (F.col("se2") + F.col("tau2")))
    )
    lam = stats.filter(F.col("se2") > 0).select(
        "d", "n1", "n0", "delta", log_lambda.alias("log_lambda")
    )
    wmin = _gw().orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return lam.select(
        F.col("d").cast("int").alias("decile"),
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        iround(F.col("delta"), 4).alias("delta"),
        iround(F.col("log_lambda"), 6).alias("log_lambda"),
        iround(
            F.min(F.least(F.lit(1.0), F.exp(-F.col("log_lambda")))).over(wmin), 6
        ).alias("p_always_valid"),
    ).orderBy("decile")


# --- s20: Johnson–Lindenstrauss random-projection distortion audit ---------

_S20_K = 16  # projected dimensions
_S20_DIM = 64
_S20_NPAIRS = 500  # seeded probe pairs (constant across SF)


def _s20_planes() -> list[list[float]]:
    from dibimbing_case_study_etl_spark.operators.similarity import _hyperplanes

    return _hyperplanes(_S20_DIM, _S20_K, seed=271828)


def _s20_oracle() -> str:
    planes = _s20_planes()
    vals = ",\n      ".join(
        f"({j}, [{','.join(repr(x) for x in p)}])" for j, p in enumerate(planes)
    )
    # explicit per-plane dots so BOTH engines evaluate the identical
    # left-to-right expression trees (no engine-internal fold order)
    ya = [f"list_dot_product(va.v, pl{j}.p)" for j in range(_S20_K)]
    yb = [f"list_dot_product(vb.v, pl{j}.p)" for j in range(_S20_K)]
    dy2 = " + ".join(f"({a} - {b}) * ({a} - {b})" for a, b in zip(ya, yb))
    plane_joins = "\n      ".join(
        f"CROSS JOIN (SELECT p FROM planes WHERE bit = {j}) pl{j}"
        for j in range(_S20_K)
    )
    # pair ids FIRST, then two plain equi joins back to the vectors —
    # a non-equi b.vec_id = a.vec_id + half.h condition sends DuckDB's
    # planner into a corpus-sized nested loop (220s at sf0.1 vs 0.3s)
    return f"""
    WITH planes(bit, p) AS (VALUES {vals}),
    vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    half AS (SELECT COUNT(*) // 2 AS h FROM vecs),
    pid AS (
      -- offset h+1, not h: replica-grown corpora (the sf1 sweep data)
      -- clone vectors with period dividing h, and an exact-h offset
      -- would pair every probe with its own clone (dv2=0 -> 0 rows)
      SELECT a.vec_id AS ia, a.vec_id + half.h + 1 AS ib
      FROM (SELECT vec_id FROM embeddings) a CROSS JOIN half
      WHERE a.vec_id < LEAST({_S20_NPAIRS}, half.h)
    ),
    pr AS (
      SELECT pid.ia, pid.ib,
             list_dot_product(va.v, va.v) + list_dot_product(vb.v, vb.v)
               - 2 * list_dot_product(va.v, vb.v) AS dv2,
             {dy2} AS dy2
      FROM pid
      JOIN vecs va ON va.vec_id = pid.ia
      JOIN vecs vb ON vb.vec_id = pid.ib
      {plane_joins}
    ),
    rr AS (
      SELECT ia, sqrt((dy2 * 3.0 / {_S20_K}.0) / dv2) AS ratio
      FROM pr WHERE dv2 > 0
    ),
    binned AS (
      SELECT CAST(floor(ratio * 20) AS BIGINT) AS bin20,
             CAST(round_even(ratio * 1000000, 0) AS BIGINT) AS ri
      FROM rr
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ri) AS BIGINT) AS s,
             CAST(SUM(ri * ri) AS BIGINT) AS ss
      FROM binned
    )
    SELECT {sql_iround("bin20 / 20.0", 2)} AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {sql_iround("CAST(t.s AS DOUBLE) / 1000000 / t.n", 6)} AS mean_ratio,
           {sql_iround(
               "sqrt((CAST(t.ss AS DOUBLE) / 1000000000000"
               " - (CAST(t.s AS DOUBLE) / 1000000) * (CAST(t.s AS DOUBLE) / 1000000) / t.n) / t.n)",
               6,
           )} AS sd_ratio,
           t.n AS n_total
    FROM binned CROSS JOIN tot t
    GROUP BY bin20, t.n, t.s, t.ss
    ORDER BY bin_lo
    """


@query(
    "s20_jl_projection_distortion",
    oracle=_s20_oracle(),
    tags=("llm", "similarity", "sketch"),
)
def s20_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit for a 64→16 pseudo-gaussian
    random projection (the dimensionality-reduction step ahead of any
    ANN build): for a fixed probe-pair sample, the ratio of projected to
    original pairwise distance (scaled by √(3/k) — the planes' Irwin–
    Hall entries have variance 1/3) is histogrammed with its mean/sd —
    the measured concentration the JL lemma promises. Both engines
    evaluate the identical explicit expression trees (per-plane dots,
    norm-identity distances, textual left-to-right sums), so even this
    float-heavy audit hash-matches exactly; zero-distance (clone) pairs
    are excluded on both sides by the same dv²>0 predicate.

    Scale: the corpus is scanned once to project (16 broadcast-literal
    dots per row); the probe-pair set is CONSTANT-sized by construction
    ({np} pairs), so the audit's join and stats never grow with the
    corpus."""
    planes = _s20_planes()
    t = register(spark, sf_dir, ("embeddings",))
    vecs = t["embeddings"].select("vec_id", as_double(F.col("embedding")).alias("v"))
    half = F.broadcast(
        vecs.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("h"))
    )  # pair offset is h+1 below — see the oracle's clone-alignment note
    proj = [
        dot(F.col("v"), F.array(*[F.lit(x) for x in p])).alias(f"y{j}")
        for j, p in enumerate(planes)
    ]
    pv = vecs.select(
        "vec_id", "v", dot(F.col("v"), F.col("v")).alias("vv"), *proj
    )
    a = pv.select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("vv").alias("vva"),
        *[F.col(f"y{j}").alias(f"ya{j}") for j in range(_S20_K)],
    )
    b = pv.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("vv").alias("vvb"),
        *[F.col(f"y{j}").alias(f"yb{j}") for j in range(_S20_K)],
    )
    paired = (
        a.crossJoin(half)
        .filter(F.col("ia") < F.least(F.lit(_S20_NPAIRS), F.col("h")))
        .join(b, F.col("ib") == F.col("ia") + F.col("h") + 1)
    )
    dv2 = F.col("vva") + F.col("vvb") - 2 * dot(F.col("va"), F.col("vb"))
    terms = [
        (F.col(f"ya{j}") - F.col(f"yb{j}")) * (F.col(f"ya{j}") - F.col(f"yb{j}"))
        for j in range(_S20_K)
    ]
    dy2 = terms[0]
    for tm in terms[1:]:
        dy2 = dy2 + tm
    rr = (
        paired.select(dv2.alias("dv2"), dy2.alias("dy2"))
        .filter(F.col("dv2") > 0)
        .select(
            F.sqrt((F.col("dy2") * 3.0 / float(_S20_K)) / F.col("dv2")).alias("ratio")
        )
    )
    binned = rr.select(
        F.floor(F.col("ratio") * 20).cast("bigint").alias("bin20"),
        F.call_function("rint", F.col("ratio") * 1_000_000).cast("bigint").alias("ri"),
    ).localCheckpoint(eager=False)  # constant-sized; feeds totals AND bins
    tot = F.broadcast(
        binned.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("ri").cast("bigint").alias("s"),
            F.sum(F.col("ri") * F.col("ri")).cast("bigint").alias("ss"),
        )
    )
    mean = F.col("s").cast("double") / 1_000_000 / F.col("n")
    return (
        binned.groupBy("bin20")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .crossJoin(tot)
        .select(
            iround(F.col("bin20") / 20.0, 2).alias("bin_lo"),
            "n_pairs",
            iround(mean, 6).alias("mean_ratio"),
            iround(
                F.sqrt(
                    (
                        F.col("ss").cast("double") / 1_000_000_000_000
                        - mean * (F.col("s").cast("double") / 1_000_000)
                    )
                    / F.col("n")
                ),
                6,
            ).alias("sd_ratio"),
            F.col("n").alias("n_total"),
        )
        .orderBy("bin_lo")
    )


s20_jl_projection_distortion.__doc__ = s20_jl_projection_distortion.__doc__.format(
    np=_S20_NPAIRS
)


# --- t43: token-budget quality selection (prefix-sum curriculum) -----------


def _t43_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops import _sql_marker_score
    from dibimbing_case_study_etl_spark.functions.text import EN_STOPWORDS

    return f"""
    WITH base AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tokens,
             {_sql_marker_score(EN_STOPWORDS)} AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, n_tokens AS tok,
             {sql_iround('0.5 * (n_stop / n_tokens) + 0.5 * LEAST(1.0, n_tokens / 100.0)', 4)}
               AS sc
      FROM base
    ),
    tot AS (
      SELECT CAST(SUM(tok) AS BIGINT) AS total_tok,
             CAST(SUM(tok) AS BIGINT) // 4 AS budget
      FROM q
    ),
    cum AS (
      SELECT source, sc, tok,
             SUM(tok) OVER (ORDER BY sc DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q
    ),
    fl AS (
      SELECT source, sc, tok, (cum - tok) < t.budget AS sel, t.budget, t.total_tok
      FROM cum CROSS JOIN tot t
    ),
    th AS (
      SELECT {sql_iround('MIN(sc)', 4)} AS min_score_admitted FROM fl WHERE sel
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN sel THEN tok ELSE 0 END) AS BIGINT) AS tokens_selected,
           {sql_iround(
               'CAST(SUM(CASE WHEN sel THEN tok ELSE 0 END) AS DOUBLE) / SUM(tok)', 6
           )} AS token_share_selected,
           MAX(budget) AS budget_tokens,
           MAX(th.min_score_admitted) AS min_score_admitted
    FROM fl CROSS JOIN th
    GROUP BY source
    ORDER BY source
    """


@query(
    "t43_token_budget_selection",
    oracle=_t43_oracle(),
    tags=("llm", "text", "curation"),
)
def t43_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked data selection under a token budget (the DataComp/
    FineWeb curation step): documents are ordered by t02's composite
    quality score, the distributed prefix sum accumulates their token
    counts in that order, and every document whose running total STARTS
    below budget (25% of corpus tokens) is selected — the greedy
    best-quality-first fill. Per-source admission stats plus the global
    admission threshold (the lowest quality score selected) are the
    published artifact: they say what a budget cut does to the mix.

    Scale: ordering + accumulation is the range-bucketed prefix sum
    (bounded driver state), NOT a global window; everything else is one
    doc-grain scan and a |sources|-row aggregate."""
    from dibimbing_case_study_etl_spark.functions.text import (
        EN_STOPWORDS,
        marker_score,
        token_count,
    )
    from dibimbing_case_study_etl_spark.operators.packing import prefix_sum

    t = register(spark, sf_dir, ("documents",))
    n_tokens = token_count(F.col("text"))
    stop_ratio = marker_score(F.col("text"), EN_STOPWORDS) / n_tokens
    score = iround(
        0.5 * stop_ratio + 0.5 * F.least(F.lit(1.0), n_tokens / 100.0), 4
    )
    base = t["documents"].select(
        "doc_id",
        "source",
        (-score).alias("negq"),
        n_tokens.alias("tok"),
    )
    total = F.broadcast(
        base.agg(
            F.sum("tok").cast("bigint").alias("total_tok"),
            F.count(F.lit(1)).cast("bigint").alias("total_docs"),
        ).select("*", F.expr("total_tok div 4").cast("bigint").alias("budget"))
    )
    cum = prefix_sum(base, "tok", ["negq", "doc_id"], out_col="cum")
    flagged = cum.crossJoin(total).select(
        "source",
        "negq",
        "tok",
        ((F.col("cum") - F.col("tok")) < F.col("budget")).alias("sel"),
        "budget",
        "total_tok",
    )
    thresh = F.broadcast(
        flagged.filter(F.col("sel"))
        .agg(F.max("negq").alias("mx"))
        .select(iround(-F.col("mx"), 4).alias("min_score_admitted"))
    )
    return (
        flagged.groupBy("source", "budget", "total_tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("tokens_total"),
            F.sum(F.when(F.col("sel"), 1).otherwise(0)).cast("bigint").alias("n_selected"),
            F.sum(F.when(F.col("sel"), F.col("tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_selected"),
        )
        .crossJoin(thresh)
        .select(
            "source",
            "n_docs",
            "n_selected",
            "tokens_total",
            "tokens_selected",
            iround(F.col("tokens_selected") / F.col("tokens_total").cast("double"), 6).alias(
                "token_share_selected"
            ),
            F.col("budget").alias("budget_tokens"),
            "min_score_admitted",
        )
        .orderBy("source")
    )


# --- b04: BPE vocab-size curve (merge-table prefixes) ----------------------

_B04_MERGES = 6
_B04_PREFIXES = (0, 2, 4, 6)


def _b04_oracle() -> str:
    from dibimbing_case_study_etl_spark.operators.bpe import _sql_bpe_parts

    parts = _sql_bpe_parts(_B04_MERGES)
    sym_split = "string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1))"
    stat_selects = []
    for k in _B04_PREFIXES:
        parts.append(
            f"""v{k} AS (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab
           FROM (SELECT unnest({sym_split}) AS sym FROM w{k})),
    s{k} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(n) AS BIGINT) AS occ,
             CAST(SUM(n * (length(s) - length(replace(s, chr(1), '')))) AS BIGINT)
               AS tok
      FROM w{k}
    )"""
        )
        stat_selects.append(
            f"""SELECT CAST({k} AS INTEGER) AS n_merges, v{k}.vocab AS vocab_symbols,
             s{k}.n_words, s{k}.occ AS word_occurrences, s{k}.tok AS n_tokens,
             {sql_iround(f"s{k}.tok * 1.0 / s{k}.occ", 4)} AS fertility,
             {sql_iround(f"b0.tok0 * 1.0 / s{k}.tok", 4)} AS compression
      FROM v{k} CROSS JOIN s{k} CROSS JOIN b0"""
        )
    parts.append("b0 AS (SELECT tok AS tok0 FROM s0)")
    union = "\n      UNION ALL ".join(stat_selects)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM ({union}) ORDER BY n_merges"
    )


@query(
    "b04_bpe_vocab_size_curve",
    oracle=_b04_oracle(),
    tags=("llm", "tokenizer", "bpe"),
)
def b04_bpe_vocab_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab-size selection curve: the {m}-merge BPE table is
    learned ONCE, then merge-table PREFIXES of size 0/2/4/6 are applied
    to the same word vocabulary (s17's one-corpus-many-settings pattern
    pointed at the tokenizer) — per setting: symbol-vocab size, token
    count, fertility, and compression vs the character baseline. This is
    the curve a team reads to pick a vocab size before training (b01
    learns, b02 cards one setting, b03 generalizes; this SWEEPS the
    knob). Because greedy BPE applies merges in rank order, prefix-k
    application is bit-identical to the oracle's k-th training layer.

    Scale: learning is b01's bounded-driver loop (one pair-count
    aggregate per merge over the WORD VOCAB, not the corpus); each
    prefix evaluation is one codegen projection (chained literal
    replaces) + two vocab-sized aggregates."""
    from dibimbing_case_study_etl_spark.operators.bpe import (
        SEP_L,
        SEP_R,
        apply_merges,
        learn_bpe_merges,
        wrap_word_vocab,
    )

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    merges = learn_bpe_merges(docs, "text", _B04_MERGES)
    words0 = wrap_word_vocab(docs, "text").localCheckpoint(eager=True)

    sym_count = F.length("s") - F.length(F.replace(F.col("s"), F.lit(SEP_L), F.lit("")))
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP_R + SEP_L)
    base = F.broadcast(
        words0.agg(F.sum(F.col("n") * sym_count).cast("bigint").alias("tok0"))
    )
    outs = []
    for k in _B04_PREFIXES:
        wk = apply_merges(words0, merges[:k]).localCheckpoint(eager=False)
        vocab = wk.select(F.explode(syms).alias("sym")).agg(
            F.count_distinct("sym").cast("bigint").alias("vocab_symbols")
        )
        stats = wk.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n").cast("bigint").alias("word_occurrences"),
            F.sum(F.col("n") * sym_count).cast("bigint").alias("n_tokens"),
        )
        outs.append(
            F.broadcast(vocab)
            .crossJoin(F.broadcast(stats))
            .crossJoin(base)
            .select(
                F.lit(k).cast("int").alias("n_merges"),
                "vocab_symbols",
                "n_words",
                "word_occurrences",
                "n_tokens",
                iround(F.col("n_tokens") * 1.0 / F.col("word_occurrences"), 4).alias(
                    "fertility"
                ),
                iround(F.col("tok0") * 1.0 / F.col("n_tokens"), 4).alias("compression"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    result = out.orderBy("n_merges")
    words0.unpersist()
    return result


b04_bpe_vocab_size_curve.__doc__ = b04_bpe_vocab_size_curve.__doc__.format(
    m=_B04_MERGES
)


# --- r07: rank-biased overlap between the two retrieval rankers ------------

_R07_DEPTH = 50
_R07_SHOW = 10
_R07_P = 0.9  # RBO persistence


def _r07_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import _R01_ORACLE
    from dibimbing_case_study_etl_spark.queries.llm_ops14 import _R06_TOPK  # noqa: F401

    r06 = _r06_oracle().strip()
    return f"""
    WITH ra AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rnk
      FROM ({_R01_ORACLE})
    ),
    rb AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rnk
      FROM ({r06})
    ),
    joint AS (
      SELECT GREATEST(ra.rnk, rb.rnk) AS lo
      FROM ra JOIN rb ON ra.doc_id = rb.doc_id
      WHERE ra.rnk <= {_R07_DEPTH} AND rb.rnk <= {_R07_DEPTH}
    ),
    depths AS (SELECT unnest(generate_series(1, {_R07_DEPTH})) AS d),
    ov AS (
      SELECT d.d, CAST(COUNT(j.lo) AS BIGINT) AS x
      FROM depths d LEFT JOIN joint j ON j.lo <= d.d
      GROUP BY d.d
    ),
    terms AS (
      SELECT d, x,
             CAST(round_even((1 - {_R07_P}) * power({_R07_P}, d - 1)
                             * (CAST(x AS DOUBLE) / d) * 1000000000, 0) AS BIGINT)
               AS t9
      FROM ov
    ),
    rbo AS (SELECT CAST(SUM(t9) AS BIGINT) AS s FROM terms)
    SELECT CAST(terms.d AS INTEGER) AS depth, terms.x AS n_common,
           {sql_iround("CAST(terms.x AS DOUBLE) / terms.d", 4)} AS overlap_at_d,
           {sql_iround("rbo.s / 1000000000.0", 6)} AS rbo
    FROM terms CROSS JOIN rbo
    WHERE terms.d <= {_R07_SHOW}
    ORDER BY depth
    """


@query(
    "r07_ranker_rank_biased_overlap",
    oracle=_r07_oracle(),
    tags=("llm", "retrieval", "evaluation"),
)
def r07_ranker_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between the engine's two
    retrieval rankers — BM25 (r01) and Dirichlet query-likelihood (r06)
    — the standard top-weighted rank-similarity that tells a search team
    whether two scorers disagree where it matters (the head) before one
    replaces the other. Overlap-at-depth comes from each shared doc's
    WORSE rank (one join, no per-depth rescan); the RBO sum's (1−p)p^
    {{d−1}}·X_d/d terms round to scaled BIGINT before summation.

    Scale: both rankings are top-{k} tables (TakeOrderedAndProject), so
    everything here — the rank join, the depth explosion, the RBO fold —
    runs on ≤2·{k} rows regardless of corpus size; the corpus cost is
    the two rankers' shared one-explode tf pass."""
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import r01_bm25_topk

    wa = _gw().orderBy(F.col("score").desc(), "doc_id")
    ra = r01_bm25_topk(spark, sf_dir).select(
        "doc_id", F.row_number().over(wa).cast("bigint").alias("rnk")
    )
    rb = r06_query_likelihood_topk(spark, sf_dir).select(
        "doc_id", F.row_number().over(wa).cast("bigint").alias("rnk")
    )
    joint = (
        ra.withColumnRenamed("rnk", "rnk_a")
        .join(rb.withColumnRenamed("rnk", "rnk_b"), "doc_id")
        .filter((F.col("rnk_a") <= _R07_DEPTH) & (F.col("rnk_b") <= _R07_DEPTH))
        .select(F.greatest("rnk_a", "rnk_b").alias("lo"))
    )
    depths = spark.range(1, _R07_DEPTH + 1).select(F.col("id").alias("d"))
    ov = (
        depths.join(F.broadcast(joint), F.col("lo") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("lo").cast("bigint").alias("x"))
    )
    terms = ov.select(
        "d",
        "x",
        F.call_function(
            "rint",
            (1 - _R07_P)
            * F.pow(F.lit(_R07_P), F.col("d") - 1)
            * (F.col("x").cast("double") / F.col("d"))
            * 1_000_000_000,
        )
        .cast("bigint")
        .alias("t9"),
    ).localCheckpoint(eager=False)  # 50 rows; feeds the RBO sum AND the output
    rbo = F.broadcast(terms.agg(F.sum("t9").cast("bigint").alias("s")))
    return (
        terms.filter(F.col("d") <= _R07_SHOW)
        .crossJoin(rbo)
        .select(
            F.col("d").cast("int").alias("depth"),
            F.col("x").alias("n_common"),
            iround(F.col("x").cast("double") / F.col("d"), 4).alias("overlap_at_d"),
            iround(F.col("s") / 1_000_000_000.0, 6).alias("rbo"),
        )
        .orderBy("depth")
    )


r07_ranker_rank_biased_overlap.__doc__ = r07_ranker_rank_biased_overlap.__doc__.format(
    k=_R07_DEPTH
)


# --- t44: per-source token-distribution drift (KL divergence) --------------

_T44_VOCAB = 64  # top tokens by global frequency entering the divergence


def _t44_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
      FROM documents
    ),
    gl AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS g FROM tok GROUP BY tok),
    top AS (
      SELECT tok, g FROM gl ORDER BY g DESC, tok LIMIT {_T44_VOCAB}
    ),
    gtot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt FROM top),
    st AS (
      SELECT source, tok.tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok JOIN top ON top.tok = tok.tok
      GROUP BY source, tok.tok
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY source),
    terms AS (
      SELECT st.source,
             CAST(round_even(
               (CAST(st.c AS DOUBLE) / stot.n)
               * ln((CAST(st.c AS DOUBLE) / stot.n)
                    / (CAST(top.g AS DOUBLE) / g2.gt)) * 1000000000, 0) AS BIGINT)
               AS t9
      FROM st
      JOIN stot ON stot.source = st.source
      JOIN top ON top.tok = st.tok
      CROSS JOIN gtot g2
    )
    SELECT terms.source,
           stot.n AS n_top_tokens,
           {sql_iround("CAST(SUM(t9) AS BIGINT) / 1000000000.0", 6)} AS kl_nats
    FROM terms JOIN stot ON stot.source = terms.source
    GROUP BY terms.source, stot.n
    ORDER BY terms.source
    """


@query(
    "t44_source_token_drift",
    oracle=_t44_oracle(),
    tags=("llm", "text", "quality", "monitoring"),
)
def t44_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: KL(source ‖ corpus) over the
    top-{v} global vocabulary — the distribution-shift monitor a data
    pipeline runs per ingest source before mixing (t19 confuses
    languages, t31 anneals mixtures; this measures how far each source's
    unigram profile sits from the corpus it joins). Restricting to the
    global top-{v} keeps the support identical on both sides (no
    zero-probability terms) and the divergence table model-sized;
    per-term p·ln(p/q) rounds to scaled BIGINT before the per-source
    sum.

    Scale: one corpus explode feeds the global count (partial agg); the
    per-source counts join against the BROADCAST top-vocab so only
    top-vocab occurrences shuffle; everything after runs on
    |sources|×{v} rows."""
    from dibimbing_case_study_etl_spark.functions.text import tokens

    t = register(spark, sf_dir, ("documents",))
    tok = t["documents"].select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)  # one explode feeds global AND per-source
    gl = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("g"))
    top = F.broadcast(gl.orderBy(F.col("g").desc(), "tok").limit(_T44_VOCAB))
    gtot = F.broadcast(top.agg(F.sum("g").cast("bigint").alias("gt")))
    st = (
        tok.join(top, "tok")
        .groupBy("source", "tok", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stot = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("g").cast("double") / F.col("gt")
    terms = (
        st.join(stot, "source")
        .crossJoin(gtot)
        .select(
            "source",
            "n",
            F.call_function("rint", p * F.log(p / q) * 1_000_000_000)
            .cast("bigint")
            .alias("t9"),
        )
    )
    return (
        terms.groupBy("source", "n")
        .agg(F.sum("t9").cast("bigint").alias("s"))
        .select(
            "source",
            F.col("n").alias("n_top_tokens"),
            iround(F.col("s") / 1_000_000_000.0, 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


t44_source_token_drift.__doc__ = t44_source_token_drift.__doc__.format(v=_T44_VOCAB)


# --- x07: cluster-randomized design effect (ICC) ----------------------------


_X07_ORACLE = f"""
    WITH cust AS (
      SELECT c.c_custkey, c.c_nationkey AS cluster,
             CAST(COALESCE(SUM(CAST(round_even(o.o_totalprice, 0) AS BIGINT)), 0)
                  AS BIGINT) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ),
    per_cluster AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS nc, CAST(SUM(y) AS BIGINT) AS sc
      FROM cust GROUP BY cluster
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT cluster) AS BIGINT) AS k,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM cust
    ),
    ssb AS (
      SELECT CAST(SUM(CAST(round_even(
               (CAST(pc.sc AS DOUBLE) / pc.nc - CAST(t.s AS DOUBLE) / t.n)
               * (CAST(pc.sc AS DOUBLE) / pc.nc - CAST(t.s AS DOUBLE) / t.n)
               * pc.nc, 0) AS BIGINT)) AS BIGINT) AS b
      FROM per_cluster pc CROSS JOIN tot t
    ),
    anova AS (
      SELECT t.n, t.k,
             CAST(ssb.b AS DOUBLE) / (t.k - 1) AS msb,
             ((CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n) - ssb.b)
               / (t.n - t.k) AS msw,
             CAST(t.n AS DOUBLE) / t.k AS mbar
      FROM tot t CROSS JOIN ssb
    )
    SELECT n AS n_units, k AS n_clusters,
           {sql_iround("msb", 2)} AS ms_between,
           {sql_iround("msw", 2)} AS ms_within,
           {sql_iround("(msb - msw) / (msb + (mbar - 1) * msw)", 6)} AS icc,
           {sql_iround("1 + (mbar - 1) * ((msb - msw) / (msb + (mbar - 1) * msw))", 4)}
             AS design_effect,
           {sql_iround(
               "n / (1 + (mbar - 1) * ((msb - msw) / (msb + (mbar - 1) * msw)))", 1
           )} AS n_effective
    FROM anova
"""


@query(
    "x07_cluster_randomization_deff",
    oracle=_X07_ORACLE,
    tags=("experimentation", "design"),
)
def x07_cluster_randomization_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of cluster randomization: if an experiment must
    randomize whole nations (geo tests, pricing, anything with
    interference), per-customer spend is correlated within a cluster and
    the effective sample size shrinks by DEFF = 1 + (m̄−1)·ICC — the
    number x03's power math must divide by before promising an MDE. ICC
    comes from the one-way ANOVA estimator ((MSB−MSW)/(MSB+(m̄−1)MSW));
    the between-cluster sum of squares rounds each cluster's term to
    BIGINT before summation (25 terms, order-free), everything else is
    exact-BIGINT sufficient statistics.

    Scale: one customer-keyed LEFT join-aggregate (zero-order customers
    count, with y=0 — dropping them biases ICC), one |clusters|-row
    aggregate, one-row closed forms."""
    t = register(spark, sf_dir, ("customer", "orders"))
    # whole dollars: per-customer totals get SQUARED below — cents-scale
    # y**2 sums overflow BIGINT by sf0.01
    cents = F.call_function("rint", F.col("o_totalprice")).cast("bigint")
    cust = (
        t["customer"]
        .select("c_custkey", F.col("c_nationkey").alias("cluster"))
        .join(
            t["orders"].select(F.col("o_custkey").alias("c_custkey"), cents.alias("cts")),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "cluster")
        .agg(F.coalesce(F.sum("cts"), F.lit(0)).cast("bigint").alias("y"))
    ).localCheckpoint(eager=False)  # feeds per-cluster AND global sums
    per_cluster = cust.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.sum("y").cast("bigint").alias("sc"),
    )
    tot = F.broadcast(
        cust.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("cluster").cast("bigint").alias("k"),
            F.sum("y").cast("bigint").alias("s"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
        )
    )
    dev = F.col("sc").cast("double") / F.col("nc") - F.col("s").cast("double") / F.col("n")
    ssb = F.broadcast(
        per_cluster.crossJoin(tot)
        .select(
            F.call_function("rint", dev * dev * F.col("nc")).cast("bigint").alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("b"))
    )
    msb = F.col("b").cast("double") / (F.col("k") - 1)
    msw = (
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        - F.col("b")
    ) / (F.col("n") - F.col("k"))
    mbar = F.col("n").cast("double") / F.col("k")
    icc = (msb - msw) / (msb + (mbar - 1) * msw)
    return tot.crossJoin(ssb).select(
        F.col("n").alias("n_units"),
        F.col("k").alias("n_clusters"),
        iround(msb, 2).alias("ms_between"),
        iround(msw, 2).alias("ms_within"),
        iround(icc, 6).alias("icc"),
        iround(1 + (mbar - 1) * icc, 4).alias("design_effect"),
        iround(F.col("n") / (1 + (mbar - 1) * icc), 1).alias("n_effective"),
    )


# --- f04: seasonal decomposition strength on monthly revenue ---------------


_F04_ORACLE = f"""
    WITH series AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
             CAST(month(o_orderdate) AS BIGINT) AS moy,
             CAST(SUM(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    rel AS (
      SELECT m - (SELECT MIN(m) FROM series) AS m, moy, cents FROM series
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(m * cents) AS BIGINT) AS sxy, CAST(SUM(m * m) AS BIGINT) AS sxx
      FROM rel
    ),
    fit AS (
      SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n AS a
      FROM sums
    ),
    det AS (
      SELECT moy, m,
             CAST(round_even((rel.cents - fit.a - fit.b * rel.m) / 10000, 0) AS BIGINT)
               AS d
      FROM rel CROSS JOIN fit
    ),
    seas AS (
      SELECT moy, CAST(COUNT(*) AS BIGINT) AS nm, CAST(SUM(d) AS BIGINT) AS sd
      FROM det GROUP BY moy
    ),
    resid AS (
      SELECT det.moy, det.d,
             CAST(round_even(det.d - CAST(seas.sd AS DOUBLE) / seas.nm, 0) AS BIGINT)
               AS r
      FROM det JOIN seas ON seas.moy = det.moy
    ),
    var AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS sd1, CAST(SUM(d * d) AS BIGINT) AS sdd,
             CAST(SUM(r) AS BIGINT) AS sr1, CAST(SUM(r * r) AS BIGINT) AS srr
      FROM resid
    ),
    strength AS (
      SELECT GREATEST(0.0, 1.0 -
               ((CAST(srr AS DOUBLE) - CAST(sr1 AS DOUBLE) * sr1 / n) / n)
               / ((CAST(sdd AS DOUBLE) - CAST(sd1 AS DOUBLE) * sd1 / n) / n)) AS f
      FROM var
    )
    SELECT CAST(seas.moy AS INTEGER) AS month_of_year,
           seas.nm AS n_months,
           {sql_iround("CAST(seas.sd AS DOUBLE) / seas.nm * 100", 2)} AS seasonal_index,
           {sql_iround("strength.f", 6)} AS seasonal_strength
    FROM seas CROSS JOIN strength
    ORDER BY month_of_year
"""


@query(
    "f04_seasonal_strength",
    oracle=_F04_ORACLE,
    tags=("forecast", "decomposition"),
)
def f04_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical trend+seasonal decomposition of monthly revenue with the
    Hyndman seasonal-strength statistic F = max(0, 1 − Var(remainder)/
    Var(detrended)): the month-of-year index table (how much each
    calendar month deviates from trend) plus one number that says
    whether seasonality is real enough for f01's seasonal-naive model to
    beat a plain naive. Trend is f02's closed-form OLS; detrended and
    remainder values round to integer cents before their variance sums,
    so every cross-engine float path is a rounded scalar, not an
    accumulation.

    Scale: one month-keyed exact aggregate of the corpus; the
    decomposition runs on the ≤ calendar-sized series (f03's bounded
    -pair discipline: model-sized tables, never data-sized windows)."""
    t = register(spark, sf_dir, ("orders",))
    series = (
        t["orders"]
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint").alias("m"),
            F.month("o_orderdate").cast("bigint").alias("moy"),
        )
        .agg(
            F.sum(F.call_function("rint", F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    m0 = F.broadcast(series.agg(F.min("m").alias("m0")))
    rel = series.crossJoin(m0).select(
        (F.col("m") - F.col("m0")).alias("m"), "moy", "cents"
    ).localCheckpoint(eager=False)  # calendar-sized; feeds fit AND decomposition
    sums = rel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("sx"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("m") * F.col("cents")).cast("bigint").alias("sxy"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sxx"),
    )
    b = (
        (F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
        / (F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
    )
    fit = F.broadcast(
        sums.select(
            b.alias("b"),
            ((F.col("sy").cast("double") - b * F.col("sx")) / F.col("n")).alias("a"),
        )
    )
    det = rel.crossJoin(fit).select(
        "moy",
        # hundreds of dollars: d gets squared below — cents-scale d**2
        # sums overflow BIGINT at sf1
        F.call_function(
            "rint", (F.col("cents") - F.col("a") - F.col("b") * F.col("m")) / 10000
        )
        .cast("bigint")
        .alias("d"),
    ).localCheckpoint(eager=False)  # feeds seasonal means AND residuals
    seas = det.groupBy("moy").agg(
        F.count(F.lit(1)).cast("bigint").alias("nm"),
        F.sum("d").cast("bigint").alias("sd"),
    )
    resid = det.join(F.broadcast(seas), "moy").select(
        F.col("d"),
        F.call_function("rint", F.col("d") - F.col("sd").cast("double") / F.col("nm"))
        .cast("bigint")
        .alias("r"),
    )
    var = F.broadcast(
        resid.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("d").cast("bigint").alias("sd1"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
            F.sum("r").cast("bigint").alias("sr1"),
            F.sum(F.col("r") * F.col("r")).cast("bigint").alias("srr"),
        )
    )
    strength = F.greatest(
        F.lit(0.0),
        1.0
        - (
            (F.col("srr").cast("double") - F.col("sr1").cast("double") * F.col("sr1") / F.col("n"))
            / F.col("n")
        )
        / (
            (F.col("sdd").cast("double") - F.col("sd1").cast("double") * F.col("sd1") / F.col("n"))
            / F.col("n")
        ),
    )
    return (
        seas.crossJoin(var)
        .select(
            F.col("moy").cast("int").alias("month_of_year"),
            F.col("nm").alias("n_months"),
            iround(F.col("sd").cast("double") / F.col("nm") * 100, 2).alias(
                "seasonal_index"
            ),
            iround(strength, 6).alias("seasonal_strength"),
        )
        .orderBy("month_of_year")
    )
