"""Round-6 additions III: incremental view maintenance on the commit log,
dedup-threshold sensitivity, and exact-size weighted sampling.

- ``u07`` closes the loop between the txlog table format (u06) and the
  incremental-rollup operator family (u01): a grouped rollup is
  maintained across table versions from the COMMIT DIFF ONLY — the
  files each commit added and removed — never re-reading carried-over
  data. Hash-equality against the oracle's full per-version recompute
  is the IVM correctness proof (incremental ≡ recompute).
- ``d20`` turns d02/d03's fixed 0.8 Jaccard cutoff into the measured
  knob it really is: ONE shared exact-Jaccard pair table (computed once
  at the loosest threshold) serves every candidate cutoff, reporting
  pair volume, affected-document count, and mean similarity per
  threshold — the sensitivity table an operator reads before choosing
  how aggressively to delete (the s17 one-assignment-many-settings
  pattern applied to dedup).
- ``t39`` is Efraimidis–Spirakis A-ES weighted reservoir sampling with
  a deterministic hash-derived uniform: key = ln(u)/w, keep the top-k —
  an EXACT-size weighted sample (t24's hash-Bernoulli gives expected
  rates, not exact counts) with no RNG state, reproducible on any
  cluster layout.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl)
has none of these surfaces; beyond-reference warehouse/LLM-pipeline
mandate (u07 extends u06's re-expression of the reference's Postgres
transactional contract to derived-view maintenance).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import fingerprint, sql_fingerprint
from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable
from dibimbing_case_study_etl_spark.queries import query

# --- u07: incremental rollup maintenance over txlog version diffs ----------

_U07_BUCKETS = 7

_U07_ORACLE = f"""
    WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    v0 AS (SELECT CAST(0 AS BIGINT) AS version, k, p FROM o WHERE k % 4 <> 3),
    v1 AS (SELECT CAST(1 AS BIGINT), k,
                  CASE WHEN k % 2 = 1 THEN p + 10 ELSE p END FROM o),
    v2 AS (SELECT CAST(2 AS BIGINT), k,
                  CASE WHEN k % 2 = 1 THEN p + 10 ELSE p END
           FROM o WHERE k % 4 <> 2),
    allv AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT version, CAST(k % {_U07_BUCKETS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round_even(p * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM allv
    GROUP BY version, bucket
    ORDER BY version, bucket
"""


@query(
    "u07_txlog_incremental_rollup",
    oracle=_U07_ORACLE,
    tags=("warehouse", "acid", "incremental", "rollup"),
)
def u07_txlog_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance on the commit-log table: a per-bucket
    (count, cents) rollup is computed in full ONCE at version 0, then
    advanced to versions 1 and 2 from each commit's file DIFF alone —
    rows in added files count +1, rows in removed files count −1, summed
    into the running state. Carried-over files are never re-read (the
    payoff of u06's stats-pruned copy-on-write: a merge's delta IS its
    rewritten file set). The oracle recomputes every version from
    scratch, so the driver hash asserts incremental ≡ recompute — the
    IVM correctness contract.

    Scale: per version the work is proportional to the CHANGED data
    (one signed union-aggregate over added+removed files), not the
    table; rollup states are bucket-sized and combine by exact-BIGINT
    addition, so maintenance is associative and restartable."""
    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="txlog_u07_")
    try:
        table = TxLogTable.create(root)
        table.append(o.filter(F.col("k") % 4 != 3), key_col="k", target_files=4)
        table.merge(
            spark,
            o.filter(F.col("k") % 2 == 1).withColumn("p", F.col("p") + F.lit(10.0)),
            "k",
            target_files=4,
        )
        table.merge(
            spark, o.filter(F.col("k") % 4 == 2), "k", delete=True, target_files=4
        )

        bucket = (F.col("k") % _U07_BUCKETS).cast("bigint").alias("bucket")
        cents = F.call_function("rint", F.col("p") * 100).cast("bigint")

        def signed(paths: list[str], sign: int) -> DataFrame | None:
            if not paths:
                return None
            return spark.read.parquet(*[f"{root}/{p}" for p in paths]).select(
                bucket,
                F.lit(sign).cast("bigint").alias("d_rows"),
                (cents * sign).alias("d_cents"),
            )

        # full compute at version 0, then pure diffs
        state = (
            table.read(spark, as_of=0)
            .select(bucket, F.lit(1).cast("bigint").alias("d_rows"), cents.alias("d_cents"))
            .groupBy("bucket")
            .agg(F.sum("d_rows").alias("n_rows"), F.sum("d_cents").alias("cents"))
            .localCheckpoint(eager=True)
        )
        outs = [
            state.select(F.lit(0).cast("bigint").alias("version"), "bucket", "n_rows", "cents")
        ]
        for v in (1, 2):
            commit = table.commits(as_of=v)[-1]
            adds = [f["path"] for f in commit.get("added", ())]
            rems = commit.get("removed", [])
            parts = [
                d
                for d in (
                    state.select(
                        "bucket", F.col("n_rows").alias("d_rows"), F.col("cents").alias("d_cents")
                    ),
                    signed(adds, 1),
                    signed(rems, -1),
                )
                if d is not None
            ]
            delta = parts[0]
            for d in parts[1:]:
                delta = delta.unionByName(d)
            state = (
                delta.groupBy("bucket")
                .agg(F.sum("d_rows").alias("n_rows"), F.sum("d_cents").alias("cents"))
                .filter(F.col("n_rows") > 0)
                .localCheckpoint(eager=True)
            )
            outs.append(
                state.select(
                    F.lit(v).cast("bigint").alias("version"), "bucket", "n_rows", "cents"
                )
            )
        out = outs[0]
        for d in outs[1:]:
            out = out.unionByName(d)
        result = out.orderBy("version", "bucket").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result


# --- d20: dedup threshold sensitivity --------------------------------------

_D20_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def _d20_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops import _SQL_SHINGLE_CTE

    ts = ", ".join(f"(CAST({t} AS DOUBLE))" for t in _D20_THRESHOLDS)
    return f"""
    WITH {_SQL_SHINGLE_CTE},
    pairs AS (
      SELECT doc_a, doc_b,
             n_common / (sa.n + sb.n - n_common) AS jacc
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= {_D20_THRESHOLDS[0]}
    ),
    th(threshold) AS (VALUES {ts}),
    base AS (
      SELECT th.threshold,
             CAST(COUNT(p.doc_a) AS BIGINT) AS n_pairs,
             COALESCE({sql_iround("CAST(SUM(CAST(round_even(p.jacc * 1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(p.doc_a)", 6)}, 0.0)
               AS mean_jaccard
      FROM th LEFT JOIN pairs p ON p.jacc >= th.threshold
      GROUP BY th.threshold
    ),
    expl AS (
      SELECT th.threshold, p.doc_a AS d FROM th JOIN pairs p ON p.jacc >= th.threshold
      UNION ALL
      SELECT th.threshold, p.doc_b FROM th JOIN pairs p ON p.jacc >= th.threshold
    ),
    nd AS (SELECT threshold, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
           FROM expl GROUP BY threshold)
    SELECT base.threshold, base.n_pairs,
           COALESCE(nd.n_docs, 0) AS n_docs,
           base.mean_jaccard
    FROM base LEFT JOIN nd ON base.threshold = nd.threshold
    ORDER BY base.threshold
    """


@query(
    "d20_dedup_threshold_sensitivity",
    oracle=_d20_oracle(),
    tags=("llm", "dedup", "audit"),
)
def d20_dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sensitivity for near-dup deletion: pair volume, distinct
    documents touched, and mean similarity at every candidate Jaccard
    cutoff — computed from ONE exact pair table built at the loosest
    threshold (the s17 one-assignment-many-settings pattern: the
    expensive candidate generation is shared; each cutoff is a filter).
    This is the table an operator reads before choosing how much of the
    corpus d07's keeper rule will delete.

    Scale: the shingle inverted-index self-join runs once; each pair
    (and each document, via its max incident similarity) is then binned
    to its HIGHEST passing threshold in one pass — per-threshold counts
    and sums are suffix sums over the |thresholds|-row histograms, so
    nothing is exploded ×|thresholds| and no (threshold, doc)
    count-distinct shuffle exists (the r6-initial shape cost 8.4× on
    10× data from exactly those two)."""
    from dibimbing_case_study_etl_spark.operators.dedup import jaccard_pairs

    t = register(spark, sf_dir, ("documents",))
    pairs = jaccard_pairs(
        t["documents"], "doc_id", "text", k=3, threshold=_D20_THRESHOLDS[0]
    ).localCheckpoint(eager=True)  # feeds the pair histogram AND doc maxima —
    # EAGER: both consumers sit in ONE job, and two sibling scans of a lazy
    # checkpoint compute the whole (prefix-filter + verify) subtree twice

    def bucket(col: F.Column) -> F.Column:
        b = F.lit(0)
        for th in _D20_THRESHOLDS:
            b = b + F.when(col >= F.lit(th).cast("double"), 1).otherwise(0)
        return b.alias("bkt")

    pair_h = pairs.select(
        bucket(F.col("jaccard")),
        F.call_function("rint", F.col("jaccard") * 1_000_000).cast("bigint").alias("j6"),
    ).groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("j6").cast("bigint").alias("sj"),
    )
    doc_h = (
        pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("d"), "jaccard")
        .groupBy("d")
        .agg(F.max("jaccard").alias("mj"))
        .select(bucket(F.col("mj")))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    )
    all_t = spark.range(1).select(
        F.posexplode(
            F.array(*[F.lit(t).cast("double") for t in _D20_THRESHOLDS])
        ).alias("i", "threshold")
    ).select((F.col("i") + 1).alias("i"), "threshold")
    base = (
        all_t.join(F.broadcast(pair_h), F.col("bkt") >= F.col("i"), "left")
        .groupBy("i", "threshold")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.sum("sj"), F.lit(0)).cast("bigint").alias("sj"),
        )
    )
    docs_at_t = (
        all_t.join(F.broadcast(doc_h), F.col("bkt") >= F.col("i"), "left")
        .groupBy("i")
        .agg(F.coalesce(F.sum("nd"), F.lit(0)).cast("bigint").alias("n_docs"))
    )
    return (
        base.join(docs_at_t, "i")
        .select(
            "threshold",
            "n_pairs",
            "n_docs",
            F.when(
                F.col("n_pairs") > 0,
                iround(F.col("sj") / F.lit(1_000_000.0) / F.col("n_pairs"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_jaccard"),
        )
        .orderBy("threshold")
    )


# --- t39: exact-size weighted reservoir sample (A-ES) ----------------------

_T39_K = 100
_FP_P = 2_147_483_647


def _t39_oracle() -> str:
    fp = sql_fingerprint("CAST(doc_id AS VARCHAR)")
    key = (
        f"ln((({fp}) + 1.0) / {_FP_P + 1}) / n_chars"
    )
    return f"""
    SELECT doc_id, n_chars AS weight,
           {sql_iround(key, 12)} AS sample_key,
           CAST(ROW_NUMBER() OVER (ORDER BY {sql_iround(key, 12)} DESC, doc_id)
                AS BIGINT) AS rank
    FROM documents
    WHERE n_chars > 0
    ORDER BY sample_key DESC, doc_id
    LIMIT {_T39_K}
    """


@query(
    "t39_weighted_reservoir_sample",
    oracle=_t39_oracle(),
    tags=("llm", "text", "sampling"),
)
def t39_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size weighted sample via Efraimidis–Spirakis A-ES: each
    document draws a deterministic uniform from its id's rolling
    fingerprint (u = (fp+1)/(P+1) ∈ (0,1]), gets key = ln(u)/weight
    (weight = characters, i.e. length-proportional inclusion), and the
    top-{k} keys ARE the sample — the distributed equivalent of
    sequential weighted reservoir sampling, with exact sample size
    (t24's Bernoulli buckets only hit target rates in expectation) and
    zero RNG state: any cluster, any partitioning, same sample.

    Scale: one map stage (fingerprint + key) and a
    TakeOrderedAndProject top-{k} — k rows per partition reach the
    driver-side heap merge; the corpus is never shuffled."""
    t = register(spark, sf_dir, ("documents",))
    key = iround(
        F.log((fingerprint("CAST(doc_id AS STRING)") + F.lit(1.0)) / F.lit(float(_FP_P + 1)))
        / F.col("n_chars"),
        12,
    )
    from pyspark.sql import Window as W

    ranked = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").alias("weight"), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_T39_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(_gw().orderBy(F.col("sample_key").desc(), "doc_id"))
            .cast("bigint"),
        )
    )
    return ranked


t39_weighted_reservoir_sample.__doc__ = t39_weighted_reservoir_sample.__doc__.format(
    k=_T39_K
)


# --- s18: clustering evaluated against labels (purity + NMI) ---------------


def _s18_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops6 import SQL_SEEDED_ASSIGNMENT

    ent = lambda p: f"CAST(round_even((-({p}) * ln({p})) * 1000000000, 0) AS BIGINT)"  # noqa: E731
    return f"""
    WITH {SQL_SEEDED_ASSIGNMENT},
    lab AS (
      SELECT a.vec_id, a.cell, e.label
      FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
    ),
    ct AS (
      SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY cell, label
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells,
                   CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
            FROM ct),
    marg_c AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS nc FROM ct GROUP BY cell),
    marg_l AS (SELECT label, CAST(SUM(n) AS BIGINT) AS nl FROM ct GROUP BY label),
    purity AS (
      SELECT CAST(SUM(mx) AS BIGINT) AS pure_n FROM (
        SELECT cell, MAX(n) AS mx FROM ct GROUP BY cell
      )
    ),
    hc AS (SELECT CAST(SUM({ent("CAST(nc AS DOUBLE) / t.nn")}) AS BIGINT) AS s
           FROM marg_c CROSS JOIN tot t),
    hl AS (SELECT CAST(SUM({ent("CAST(nl AS DOUBLE) / t.nn")}) AS BIGINT) AS s
           FROM marg_l CROSS JOIN tot t),
    mi AS (
      SELECT CAST(SUM(CAST(round_even(
               (CAST(ct.n AS DOUBLE) / t.nn)
               * ln(CAST(ct.n AS DOUBLE) * t.nn
                    / (CAST(mc.nc AS DOUBLE) * ml.nl)) * 1000000000, 0)
             AS BIGINT)) AS BIGINT) AS s
      FROM ct
      JOIN marg_c mc ON mc.cell = ct.cell
      JOIN marg_l ml ON ml.label = ct.label
      CROSS JOIN tot t
    )
    SELECT t.nn AS n_vecs, t.n_cells, t.n_labels,
           {sql_iround("CAST(p.pure_n AS DOUBLE) / t.nn", 6)} AS purity,
           {sql_iround("hc.s / 1000000000.0", 6)} AS h_cluster,
           {sql_iround("hl.s / 1000000000.0", 6)} AS h_label,
           {sql_iround("mi.s / 1000000000.0", 6)} AS mutual_info,
           {sql_iround("(mi.s / 1000000000.0) / sqrt((hc.s / 1000000000.0) * (hl.s / 1000000000.0))", 6)}
             AS nmi
    FROM tot t CROSS JOIN purity p CROSS JOIN hc CROSS JOIN hl CROSS JOIN mi
    """


@query(
    "s18_cluster_label_purity",
    oracle=_s18_oracle(),
    tags=("llm", "similarity", "clustering", "evaluation"),
)
def s18_cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation: purity and normalized mutual
    information of the seeded k-means assignment (s13's exact cell
    structure) against the embedding table's ground-truth labels — the
    standard does-the-geometry-match-the-semantics check run before
    trusting cluster-based curation (d11's SemDeDup cells, s06's IVF
    routing). Entropy and MI terms are scaled-int-rounded per cell/label
    pair then exactly summed, so the information arithmetic is
    accumulation-order-free.

    Scale: the assignment is one broadcast-16-centroids scan; everything
    after runs on the |cells|×|labels| contingency table (tiny), its two
    marginals, and single-row cross joins."""
    from dibimbing_case_study_etl_spark.functions.vector import as_double
    from dibimbing_case_study_etl_spark.queries.llm_ops6 import (
        seeded_kmeans_assignment,
    )

    t = register(spark, sf_dir, ("embeddings",))
    e = t["embeddings"]
    vecs = e.select("vec_id", as_double(F.col("embedding")).alias("__v"))
    lab = seeded_kmeans_assignment(vecs).join(e.select("vec_id", "label"), "vec_id")
    ct = lab.groupBy("cell", "label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ct = ct.localCheckpoint(eager=False)  # tiny; feeds 5 downstream aggs
    tot = F.broadcast(
        ct.agg(
            F.sum("n").cast("bigint").alias("nn"),
            F.count_distinct("cell").cast("bigint").alias("n_cells"),
            F.count_distinct("label").cast("bigint").alias("n_labels"),
        )
    )
    marg_c = ct.groupBy("cell").agg(F.sum("n").cast("bigint").alias("nc"))
    marg_l = ct.groupBy("label").agg(F.sum("n").cast("bigint").alias("nl"))
    purity = F.broadcast(
        ct.groupBy("cell")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("pure_n"))
    )
    scl = F.lit(1_000_000_000)
    ent_term = lambda p: F.call_function("rint", (-p * F.log(p)) * scl).cast(  # noqa: E731
        "bigint"
    )
    hc = F.broadcast(
        marg_c.crossJoin(tot).select(
            ent_term(F.col("nc").cast("double") / F.col("nn")).alias("t")
        ).agg(F.sum("t").cast("bigint").alias("hc_s"))
    )
    hl = F.broadcast(
        marg_l.crossJoin(tot).select(
            ent_term(F.col("nl").cast("double") / F.col("nn")).alias("t")
        ).agg(F.sum("t").cast("bigint").alias("hl_s"))
    )
    mi = F.broadcast(
        ct.join(marg_c, "cell")
        .join(marg_l, "label")
        .crossJoin(tot)
        .select(
            F.call_function(
                "rint",
                (F.col("n").cast("double") / F.col("nn"))
                * F.log(
                    F.col("n").cast("double")
                    * F.col("nn")
                    / (F.col("nc").cast("double") * F.col("nl"))
                )
                * scl,
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("mi_s"))
    )
    div = F.lit(1_000_000_000.0)
    return (
        tot.crossJoin(purity)
        .crossJoin(hc)
        .crossJoin(hl)
        .crossJoin(mi)
        .select(
            F.col("nn").alias("n_vecs"),
            "n_cells",
            "n_labels",
            iround(F.col("pure_n").cast("double") / F.col("nn"), 6).alias("purity"),
            iround(F.col("hc_s") / div, 6).alias("h_cluster"),
            iround(F.col("hl_s") / div, 6).alias("h_label"),
            iround(F.col("mi_s") / div, 6).alias("mutual_info"),
            iround(
                (F.col("mi_s") / div)
                / F.sqrt((F.col("hc_s") / div) * (F.col("hl_s") / div)),
                6,
            ).alias("nmi"),
        )
    )


# --- t40: held-out n-gram LM perplexity ------------------------------------

_T40_HOLD = 7  # doc_id % 10 == 7 is the held-out split (b03's convention)


def _t40_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ),
    train_pairs AS (
      SELECT w[i] AS w1, w[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM tok WHERE doc_id % 10 <> {_T40_HOLD})
      GROUP BY w1, w2
    ),
    train_uni AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM train_pairs GROUP BY w1
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS v FROM (
        SELECT unnest(w) AS x FROM tok WHERE doc_id % 10 <> {_T40_HOLD}
      )
    ),
    hold_pairs AS (
      SELECT source, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT source, w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM tok WHERE doc_id % 10 = {_T40_HOLD})
    ),
    scored AS (
      SELECT h.source,
             CAST(round_even(
               -ln((COALESCE(tp.c2, 0) + 1.0)
                   / (COALESCE(tu.c1, 0) + v.v)) * 1000000, 0) AS BIGINT) AS nll
      FROM hold_pairs h
      LEFT JOIN train_pairs tp ON tp.w1 = h.w1 AND tp.w2 = h.w2
      LEFT JOIN train_uni tu ON tu.w1 = h.w1
      CROSS JOIN vocab v
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {sql_iround("CAST(SUM(nll) AS BIGINT) / 1000000.0 / COUNT(*)", 6)}
             AS mean_nll,
           {sql_iround("exp(CAST(SUM(nll) AS BIGINT) / 1000000.0 / COUNT(*))", 4)}
             AS perplexity
    FROM scored
    GROUP BY source
    ORDER BY source
    """


@query(
    "t40_heldout_lm_perplexity",
    oracle=_t40_oracle(),
    tags=("llm", "text", "quality", "evaluation"),
)
def t40_heldout_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM perplexity per source: an add-one-smoothed
    bigram model is trained on 90% of documents and evaluated on the
    held-out 10% (b03's split convention) — the KenLM-style quality
    number data teams publish per source before mixing (t10/t18 score
    in-sample; t23 gates; this is the held-out evaluation that justifies
    the gate's thresholds). Unseen bigrams and unseen history both fall
    back to the smoothing mass, so OOV text scores high perplexity
    instead of crashing.

    Scale: train counts are one explode + (w1,w2)-keyed partial agg;
    scoring is two hash joins keyed by token bigram/unigram (the model
    is a TABLE, not a broadcast blob — at 100 TB the bigram table is
    itself corpus-scale and must shuffle, exactly this plan); per-pair
    NLL is scaled-int-rounded then exactly summed per source."""
    from dibimbing_case_study_etl_spark.functions.text import tokens

    t = register(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id", "source", tokens(F.col("text")).alias("w")
    )
    pair_expr = F.explode(
        F.zip_with(
            F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
            F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
    ).alias("p")
    train = d.filter(F.col("doc_id") % 10 != _T40_HOLD)
    hold = d.filter(F.col("doc_id") % 10 == _T40_HOLD)
    train_pairs = (
        train.select(pair_expr)
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .localCheckpoint(eager=False)  # feeds unigram roll-up AND the score join
    )
    train_uni = train_pairs.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    vocab = F.broadcast(
        train.select(F.explode("w").alias("x")).agg(
            F.count_distinct("x").cast("bigint").alias("v")
        )
    )
    hold_pairs = hold.select("source", pair_expr).select("source", "p.w1", "p.w2")
    nll = F.call_function(
        "rint",
        -F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
        )
        * 1_000_000,
    ).cast("bigint")
    scored = (
        hold_pairs.join(train_pairs, ["w1", "w2"], "left")
        .join(train_uni, "w1", "left")
        .crossJoin(vocab)
        .select("source", nll.alias("nll"))
    )
    mean_nll = F.sum("nll").cast("bigint") / F.lit(1_000_000.0) / F.count(F.lit(1))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            iround(mean_nll, 6).alias("mean_nll"),
            iround(F.exp(mean_nll), 4).alias("perplexity"),
        )
        .orderBy("source")
    )
