"""Round-6 additions: transactional warehouse lifecycle, behavioral
Markov analytics, MinHash estimator calibration, and contrastive-training
hard-negative mining.

- ``u06`` drives the new commit-log table format
  (:mod:`operators/txlog`) end to end — append, stats-pruned
  copy-on-write MERGE, key-delete, and THREE time-travel snapshot reads
  — and hash-checks every version's row count, key sum, and money total
  against an oracle that reconstructs each version arithmetically. This
  is the ACID surface the reference delegates to Postgres transactions
  (reference ``scripts/load_parquet_to_postgres_l1.py:124-149``)
  re-expressed as a lakehouse-style log (the r4 verdict's
  "multi-writer transactionality" gap).
- ``q81`` is the first-order Markov view of the event stream: the full
  transition matrix with exact-rational probabilities plus each source
  state's next-step entropy — the behavioral-predictability audit that
  q76 (path frequencies) and q79 (one prescribed funnel) don't give.
- ``d18`` calibrates the estimator d03's scale path stakes everything
  on: for every banded-LSH candidate pair, the MinHash match-fraction
  estimate of Jaccard is compared against the exact shingle Jaccard,
  binned by matching-component count — the measured bias/error curve
  (Broder's resemblance estimator) that says how much to trust a
  16-hash signature before deleting data with it. The md5-derived hash
  family makes every signature bit-for-bit reproducible in DuckDB.
- ``t38`` mines hard negatives for contrastive training (DPR/SimCSE
  style): per labeled query vector, the top-k most-similar corpus
  vectors with a DIFFERENT label — the highest-loss negatives a
  retrieval trainer feeds its batch. Composes s01's exact cosine path
  with a label-disagreement join condition.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl)
covers none of these; the family belongs to the beyond-reference
warehouse/LLM-data-pipeline mandate, except u06 which re-expresses the
reference's Postgres transactional contract.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    dsum,
    iround,
    sql_dsum,
    sql_iround,
)
from dibimbing_case_study_etl_spark.functions.text import word_shingles
from dibimbing_case_study_etl_spark.functions.vector import (
    as_double,
    clamp_unit,
    dot,
    norm,
)
from dibimbing_case_study_etl_spark.operators.txlog import TxLogTable
from dibimbing_case_study_etl_spark.queries import query

# --- u06: transactional merge + time travel --------------------------------

_U06_ORACLE = f"""
    WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    v0 AS (SELECT k, p FROM o WHERE k % 4 <> 3),
    v1 AS (SELECT k, CASE WHEN k % 2 = 1 THEN p + 10 ELSE p END AS p FROM o),
    v2 AS (SELECT k, p FROM v1 WHERE k % 4 <> 2)
    SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys, {sql_dsum("p", 2)} AS total_price
    FROM v0
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), {sql_dsum("p", 2)}
    FROM v1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), {sql_dsum("p", 2)}
    FROM v2
    ORDER BY version
"""


@query(
    "u06_txlog_merge_timetravel",
    bench=True,  # r7: track the txlog family round-over-round
    oracle=_U06_ORACLE,
    tags=("warehouse", "acid", "merge", "timetravel"),
)
def u06_txlog_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID table lifecycle on the commit-log format: version 0 appends
    75% of orders, version 1 MERGE-upserts every odd key (price +10 —
    updates the present odds, inserts the ``k % 4 = 3`` ones), version 2
    deletes ``k % 4 = 2``. Each version is then read back BY VERSION
    (time travel over immutable files + the fold of the commit log) and
    summarized; the oracle rebuilds all three states arithmetically, so
    a wrong merge rewrite, a mis-pruned file, or a snapshot leak between
    versions moves a driver-hashed integer.

    Scale: the data plane is ordinary distributed parquet write /
    broadcast-anti-join rewrite; only files whose footer key range
    overlaps the merge batch are rewritten (per-file min/max collected at
    write time), and the log fold is O(commits) driver-side JSON — the
    Delta/Iceberg posture. The three snapshot reads are independent lazy
    plans over disjoint-by-version file lists."""
    t = register(spark, sf_dir, ("orders",))
    o = t["orders"].select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    root = tempfile.mkdtemp(prefix="txlog_u06_")
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
        versions = [
            table.read(spark, as_of=v)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("k").alias("sum_keys"),
                dsum(F.col("p"), 2).alias("total_price"),
            )
            .select(F.lit(v).cast("bigint").alias("version"), "*")
            for v in (0, 1, 2)
        ]
        out = versions[0].unionByName(versions[1]).unionByName(versions[2])
        # materialize the 3-row result, then drop the on-disk table — the
        # caller's collect must not depend on the tempdir surviving
        result = out.orderBy("version").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result


# --- q81: Markov transition matrix + per-state entropy ---------------------

_Q81_ORACLE = f"""
    WITH seq AS (
      SELECT event_type AS src_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS dst_type
      FROM events
    ),
    m AS (
      SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE dst_type IS NOT NULL
      GROUP BY src_type, dst_type
    ),
    probs AS (
      SELECT src_type, dst_type, n_trans,
             CAST(SUM(n_trans) OVER (PARTITION BY src_type) AS BIGINT) AS src_total,
             CAST(n_trans AS DOUBLE)
               / SUM(n_trans) OVER (PARTITION BY src_type) AS p_raw
      FROM m
    )
    SELECT src_type, dst_type, n_trans, src_total,
           {sql_iround("p_raw", 6)} AS p,
           CAST(RANK() OVER (PARTITION BY src_type
                             ORDER BY n_trans DESC, dst_type) AS INTEGER)
             AS dst_rank,
           (SUM(CAST(round_even((-p_raw * ln(p_raw)) * 1000000, 0) AS BIGINT))
              OVER (PARTITION BY src_type) / 1000000.0) AS src_entropy_nats
    FROM probs
    ORDER BY src_type, dst_rank, dst_type
"""


@query(
    "q81_markov_transition_entropy",
    oracle=_Q81_ORACLE,
    tags=("events", "markov", "window", "analytics"),
)
def q81_markov_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every (state, next-state) pair the transition count and probability,
    each destination's rank within its source, and the source state's
    next-step Shannon entropy (nats) — how predictable each state's
    continuation is. Probabilities are exact BIGINT ratios rounded
    half-even at 6 dp; entropy terms are scaled-int-rounded before the
    per-source sum so distributed accumulation order can't move a hash.

    Scale: one user-keyed LEAD window over the stream (the same single
    exchange q76 uses — never a self-join chain), collapsing immediately
    to the |states|² transition matrix; every window/rank after that runs
    on the tiny matrix table. The corpus-sized stage shuffles exactly
    once, keyed by ``user_id``."""
    t = register(spark, sf_dir, ("events",))
    seq = t["events"].select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst_type"),
    )
    m = (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    by_src = W.partitionBy("src_type")
    # stage the window results as real columns — an entropy window over an
    # expression that itself contains a window would not compile
    staged = (
        m.withColumn("src_total", F.sum("n_trans").over(by_src).cast("bigint"))
        .withColumn("p_raw", F.col("n_trans").cast("double") / F.col("src_total"))
        .withColumn(
            "_term",
            F.call_function(
                "rint", (-F.col("p_raw") * F.log("p_raw")) * F.lit(1_000_000)
            ).cast("bigint"),
        )
    )
    return (
        staged.withColumn("p", iround(F.col("p_raw"), 6))
        .withColumn(
            "dst_rank",
            F.rank()
            .over(by_src.orderBy(F.desc("n_trans"), F.asc("dst_type")))
            .cast("int"),
        )
        .withColumn("src_entropy_nats", F.sum("_term").over(by_src) / F.lit(1_000_000.0))
        .select(
            "src_type", "dst_type", "n_trans", "src_total", "p", "dst_rank",
            "src_entropy_nats",
        )
        .orderBy("src_type", "dst_rank", "dst_type")
    )


# --- d18: MinHash estimator calibration ------------------------------------

_D18_H = 16  # hash functions (affine families over one md5 base)
_D18_BANDS = 8  # bands of 2 rows → candidate recall down to low Jaccard
_D18_P = 2_147_483_647  # Mersenne prime 2^31-1: affine-family modulus
# 16 fixed 30-bit odd multipliers (digits of pi/e mixes — arbitrary but
# pinned; a=1 would leave every family order-isomorphic to the base hash
# and all 16 minima identical)
_D18_A = (
    314159261, 271828183, 141421357, 173205081,
    223606797, 264575131, 299999999, 161803399,
    123456791, 987654323, 577215665, 693147181,
    301029995, 434294481, 707106781, 866025403,
)
_D18_B = tuple((a * 7919 + 104729) % _D18_P for a in _D18_A)


def _d18_hash_cols_spark(s: F.Column) -> list[F.Column]:
    # ONE md5 per shingle; 16 universal-hash families derived by BIGINT
    # affine transforms (a_i·x + b_i mod p) — 4× less digest work than
    # the r6-initial 4-seeded-digests design, bit-identical in DuckDB
    # (a_i, x < 2^31 so the product stays under 2^62: no overflow on
    # either engine's signed 64-bit arithmetic)
    base = (
        F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long") % F.lit(_D18_P)
    )
    return [
        ((F.lit(a) * base + F.lit(b)) % F.lit(_D18_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(zip(_D18_A, _D18_B))
    ]


def _d18_oracle() -> str:
    base = f"(CAST(('0x' || substr(md5(s), 1, 14)) AS BIGINT) % {_D18_P})"
    h_exprs = [
        f"MIN(({a} * {base} + {b}) % {_D18_P}) AS h{i}"
        for i, (a, b) in enumerate(zip(_D18_A, _D18_B))
    ]
    sig_cols = ",\n             ".join(h_exprs)
    bands = " OR ".join(
        f"(a.h{2 * b} = b.h{2 * b} AND a.h{2 * b + 1} = b.h{2 * b + 1})"
        for b in range(_D18_BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(_D18_H)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM tok
    ),
    sig AS (
      SELECT doc_id,
             {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST({matches} AS BIGINT) AS est_matches
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({bands})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      -- LEFT join: a candidate pair with ZERO shared shingles (possible
      -- via 28-bit hash collisions) must stay, at jaccard 0
      SELECT c.doc_a, c.doc_b, c.est_matches, COUNT(b.s) AS n_common
      FROM cand c
      LEFT JOIN sh a ON a.doc_id = c.doc_a
      LEFT JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
      GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT est_matches,
             CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jacc,
             CAST(est_matches AS DOUBLE) / {_D18_H} AS est
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT est_matches, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {sql_iround(f"CAST(SUM(CAST(round_even(jacc * 1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(*)", 6)} AS mean_exact_jaccard,
           {sql_iround(f"CAST(SUM(CAST(round_even(abs(est - jacc) * 1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0 / COUNT(*)", 6)} AS mean_abs_error
    FROM pairs
    GROUP BY est_matches
    ORDER BY est_matches
    """


@query(
    "d18_minhash_estimator_calibration",
    oracle=_d18_oracle(),
    tags=("llm", "dedup", "lsh", "audit"),
    bench=True,
)
def d18_minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve for the MinHash resemblance estimator (Broder):
    every banded-LSH candidate pair's estimated Jaccard (matching
    signature components / 16) is compared against its EXACT shingle
    Jaccard, grouped by matching-component count — the measured
    error-vs-estimate table that tells a dedup operator how much a
    16-hash signature under- or over-deletes before it trusts d03's
    verdicts at 100 TB. The hash family is ONE md5 digest per shingle
    expanded into 16 affine universal-hash families ((a_i·x+b_i) mod
    2³¹−1, pure BIGINT arithmetic) — bit-reproducible in DuckDB, so even
    the "approximate" estimate is hash-checked exactly, at a quarter of
    the digest cost of a seeded-md5-per-function design.

    Scale: one shingle explode feeds the 16 min-aggregations in a single
    doc-keyed partial agg (no per-hash passes); candidates come from the
    8×2 band self-join (never all pairs); the exact-Jaccard verify joins
    shingles only for candidate pairs. Mirrors d03's plan shape with the
    estimator bits kept, not discarded."""
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    sh = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s")
    )
    from dibimbing_case_study_etl_spark.operators.dedup import _spread

    hcols = _d18_hash_cols_spark(F.col("s"))
    sig = (
        sh.groupBy("doc_id")
        .agg(*[F.min(c).alias(f"h{i}") for i, c in enumerate(hcols)])
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(_D18_H)]).alias("sig"),
        )
        .localCheckpoint(eager=False)  # reused by both sides of the band join
    )
    # band equi-join, never an OR-of-bands theta join (that plans as a
    # nested-loop over |docs|²); _spread AFTER the checkpoint so AQE's
    # coalesced layout can't serialize the explode (plan-trap 12)
    banded = _spread(sig, "doc_id").select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.col(f"sig")[2 * i].alias("v1"),
                        F.col(f"sig")[2 * i + 1].alias("v2"),
                    )
                    for i in range(_D18_BANDS)
                ]
            )
        ).alias("bv"),
    )
    pa = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa_sig"), "bv"
    )
    pb = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb_sig"), "bv"
    )
    cand = (
        pa.join(pb, (pa["bv"] == pb["bv"]) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")  # a pair may collide in several bands
        .agg(F.first("sa_sig").alias("sa_sig"), F.first("sb_sig").alias("sb_sig"))
        .select(
            "doc_a",
            "doc_b",
            F.aggregate(
                F.zip_with(
                    "sa_sig",
                    "sb_sig",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            .cast("bigint")
            .alias("est_matches"),
        )
    )
    sets = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("sset")
    )
    paired = (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sset", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sset", "sb"), "doc_b")
        .select(
            "est_matches",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / (
                    F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))
                )
            ).alias("jacc"),
            (F.col("est_matches").cast("double") / F.lit(float(_D18_H))).alias("est"),
        )
    )
    scl = F.lit(1_000_000)
    return (
        paired.groupBy("est_matches")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.call_function("rint", F.col("jacc") * scl).cast("bigint")).alias("_sj"),
            F.sum(
                F.call_function("rint", F.abs(F.col("est") - F.col("jacc")) * scl).cast(
                    "bigint"
                )
            ).alias("_se"),
        )
        .select(
            "est_matches",
            "n_pairs",
            iround(F.col("_sj") / F.lit(1_000_000.0) / F.col("n_pairs"), 6).alias(
                "mean_exact_jaccard"
            ),
            iround(F.col("_se") / F.lit(1_000_000.0) / F.col("n_pairs"), 6).alias(
                "mean_abs_error"
            ),
        )
        .orderBy("est_matches")
    )


# --- t38: hard-negative mining for contrastive training --------------------

_T38_NQUERIES = 20
_T38_K = 5

_T38_ORACLE = f"""
    SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim, rank
    FROM (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             least(1.0, greatest(-1.0,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])))) AS cos_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY least(1.0, greatest(-1.0,
                          list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                 CAST(c.embedding AS DOUBLE[])))) DESC,
                        c.vec_id
             ) AS INTEGER) AS rank
      FROM embeddings q
      JOIN embeddings c ON c.label <> q.label
      WHERE q.vec_id < {_T38_NQUERIES}
    ) WHERE rank <= {_T38_K}
"""


@query(
    "t38_hard_negative_mining",
    oracle=_T38_ORACLE,
    tags=("llm", "similarity", "training"),
)
def t38_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR/SimCSE batch
    construction): for each labeled query vector, the top-{k} most
    cosine-similar corpus vectors with a DIFFERENT label — the negatives
    closest to the decision boundary, where contrastive loss gets its
    gradient. Label disagreement subsumes self-exclusion.

    Scale: s01's exact-top-k shape — the bounded query side broadcasts
    (with labels riding along), the corpus scan computes norms once per
    vector, the label-mismatch predicate filters before any ranking, and
    the per-query window is TakeOrderedAndProject-sized. The corpus is
    never shuffled; only (query × k) survivors leave the scan stage."""
    t = register(spark, sf_dir, ("embeddings",))
    e = t["embeddings"]
    q = e.filter(F.col("vec_id") < _T38_NQUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double(F.col("embedding")).alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double(F.col("embedding")).alias("__cv"),
    ).withColumn("__cn", norm(F.col("__cv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_label") != F.col("query_label"))
        .withColumn(
            "cos_sim",
            clamp_unit(dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))),
        )
        .select("query_id", "query_label", "neighbor_id", "neighbor_label", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _T38_K)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cos_sim", "rank",
        )
    )


# --- b03: tokenizer generalization audit (held-out fertility + OOV) --------

_B03_MERGES = 8
_B03_TRAIN_WHERE = "WHERE doc_id % 10 <> 7"
_B03_HOLD_WHERE = "WHERE doc_id % 10 = 7"


def _b03_oracle() -> str:
    from dibimbing_case_study_etl_spark.operators.bpe import sql_bpe_heldout_stats

    return sql_bpe_heldout_stats(_B03_MERGES, _B03_TRAIN_WHERE, _B03_HOLD_WHERE)


@query(
    "b03_bpe_heldout_generalization",
    oracle=_b03_oracle(),
    tags=("llm", "tokenizer", "iterative", "audit"),
)
def b03_bpe_heldout_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer GENERALIZATION audit, closing the train/serve loop that
    b01 (learn merges) and b02 (in-sample card) leave open: the merge
    table is learned on 90% of documents and applied — tokenizer
    inference, the chained greedy replaces — to the held-out 10%'s word
    vocabulary. Reports held-out fertility vs training fertility (the
    gap is the generalization cost a tokenizer card must disclose) and
    the occurrence-weighted rate of held-out symbols absent from the
    trained symbol vocabulary (OOV under this merge table).

    Scale: training is b01's loop (corpus scanned once into a word-freq
    table; every iteration vocab-sized). Inference is ONE projection —
    all 8 replaces chained in a single codegen stage over the held-out
    vocab table — and every statistic is a partial-aggregable sum; the
    OOV check is a broadcast anti-join against the trained symbol set."""
    from dibimbing_case_study_etl_spark.operators.bpe import (
        SEP_L,
        SEP_R,
        apply_merges,
        learn_bpe,
        wrap_word_vocab,
    )

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    train = docs.filter(F.col("doc_id") % 10 != 7)
    hold = docs.filter(F.col("doc_id") % 10 == 7)
    merges, words = learn_bpe(train, "text", _B03_MERGES)
    h = apply_merges(wrap_word_vocab(hold, "text"), merges).localCheckpoint(
        eager=False
    )  # consumed by hstats AND the symbol explode
    k = F.length("s") - F.length(F.replace(F.col("s"), F.lit(SEP_L)))
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP_R + SEP_L)
    tstats = F.broadcast(
        words.agg(
            F.sum("n").alias("t_occ"), F.sum(F.col("n") * k).alias("t_tok")
        )
    )
    tvocab = words.select(F.explode(syms).alias("sym")).distinct()
    oov = F.broadcast(
        h.select("n", F.explode(syms).alias("sym"))
        .join(tvocab, "sym", "left_anti")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("oov_occ"),
            F.count_distinct("sym").cast("bigint").alias("oov_symbols"),
        )
    )
    hstats = h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words_heldout"),
        F.sum("n").alias("h_occ"),
        F.sum(F.col("n") * k).alias("h_tok"),
    )
    fert = lambda tok, occ: F.col(tok).cast("double") / F.col(occ)  # noqa: E731
    out = (
        hstats.crossJoin(tstats)
        .crossJoin(oov)
        .select(
            "n_words_heldout",
            F.col("h_occ").cast("bigint").alias("word_occurrences_heldout"),
            F.col("h_tok").cast("bigint").alias("n_tokens_heldout"),
            iround(fert("h_tok", "h_occ"), 4).alias("fertility_heldout"),
            iround(fert("t_tok", "t_occ"), 4).alias("fertility_train"),
            iround(fert("h_tok", "h_occ") - fert("t_tok", "t_occ"), 4).alias(
                "fertility_gap"
            ),
            "oov_symbols",
            iround(
                F.col("oov_occ").cast("double") / F.col("h_tok"), 6
            ).alias("oov_token_rate"),
        )
    )
    # words/h carry lazy checkpoints; the caller's action materializes
    # them and the ContextCleaner reclaims the blocks
    return out


# --- f02: closed-form OLS price-driver audit -------------------------------

_F02_ORACLE = f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round_even(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(round_even(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(round_even(l_quantity, 0) AS BIGINT)
                      * CAST(round_even(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(round_even(l_quantity, 0) AS BIGINT)
                      * CAST(round_even(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS sxy,
             CAST(SUM(CAST(round_even(l_extendedprice, 0) AS BIGINT)
                      * CAST(round_even(l_extendedprice, 0) AS BIGINT)) AS BIGINT) AS syy
      FROM lineitem
      GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag, n, sx, sy,
             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov_n,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS var_x_n,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS var_y_n
      FROM s
    )
    SELECT l_returnflag, n AS n_rows,
           {sql_iround("cov_n / var_x_n", 6)} AS slope,
           {sql_iround("(sy - (cov_n / var_x_n) * sx) / n", 4)} AS intercept,
           {sql_iround("(cov_n * cov_n) / (var_x_n * var_y_n)", 6)} AS r2,
           {sql_iround("CAST(sx AS DOUBLE) / n", 4)} AS mean_qty,
           {sql_iround("CAST(sy AS DOUBLE) / n", 2)} AS mean_price
    FROM d
    ORDER BY l_returnflag
"""


@query(
    "f02_ols_price_on_quantity",
    oracle=_F02_ORACLE,
    tags=("analytics", "regression", "ml"),
)
def f02_ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per return flag: regress line-item price on
    quantity via the normal equations (slope, intercept, R²) — the
    single-pass distributed regression every feature-audit / pricing
    dashboard runs before fitting anything fancier. Inputs are rounded
    to integer units per row, so all five sufficient statistics
    (Σx, Σy, Σx², Σxy, Σy²) are EXACT BIGINT partial-aggregable sums —
    order-independent under any partitioning — and the final double
    arithmetic runs the identical expression on identical inputs on both
    engines.

    Scale: one map-side-combinable aggregation over the fact table into
    |flags| rows; nothing else touches the corpus. (The y² sufficient
    statistic bounds the exact-integer path to ~1e9 rows per group at
    these magnitudes; beyond that, shard the group key or drop to the
    per-partition double accumulation the audit is calibrating.)"""
    t = register(spark, sf_dir, ("lineitem",))
    xi = F.call_function("rint", F.col("l_quantity")).cast("bigint")
    yi = F.call_function("rint", F.col("l_extendedprice")).cast("bigint")
    s = t["lineitem"].groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(yi * yi).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    slope = cov_n / var_x_n
    return s.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        iround(slope, 6).alias("slope"),
        iround((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias("intercept"),
        iround((cov_n * cov_n) / (var_x_n * var_y_n), 6).alias("r2"),
        iround(F.col("sx").cast("double") / F.col("n"), 4).alias("mean_qty"),
        iround(F.col("sy").cast("double") / F.col("n"), 2).alias("mean_price"),
    ).orderBy("l_returnflag")


# --- r04: pseudo-relevance-feedback query expansion ------------------------

_R04_FB_DOCS = 10
_R04_TOPK = 15


def _r04_oracle() -> str:
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
        _BM25_TERMS,
        _R01_ORACLE,
    )

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH fb AS (
      SELECT doc_id FROM ({_R01_ORACLE})
      ORDER BY score DESC, doc_id LIMIT {_R04_FB_DOCS}
    ),
    dd AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    cand AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df_fb
      FROM (
        SELECT dd.doc_id, unnest(list_distinct(dd.w)) AS tok
        FROM dd JOIN fb ON dd.doc_id = fb.doc_id
      )
      WHERE tok <> '' AND tok NOT IN ({terms})
      GROUP BY tok
    ),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM dd),
    cdf AS (
      SELECT x.tok, CAST(COUNT(*) AS BIGINT) AS df_corpus
      FROM (SELECT doc_id, unnest(list_distinct(w)) AS tok FROM dd) x
      JOIN cand ON x.tok = cand.tok
      GROUP BY x.tok
    )
    SELECT cand.tok AS term, cand.df_fb, cdf.df_corpus,
           {sql_iround("cand.df_fb * ln((s.n_docs - cdf.df_corpus + 0.5) / (cdf.df_corpus + 0.5) + 1.0)", 4)}
             AS offer_weight
    FROM cand JOIN cdf ON cand.tok = cdf.tok CROSS JOIN stats s
    ORDER BY offer_weight DESC, term
    LIMIT {_R04_TOPK}
    """


@query(
    "r04_prf_query_expansion",
    oracle=_r04_oracle(),
    tags=("llm", "retrieval", "text"),
)
def r04_prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RSJ offer
    weights): run r01's BM25 ranking, take the top-{fb} feedback
    documents, and mine the expansion terms a second-pass retrieval
    would add — each candidate term scored by
    ``df_feedback × idf_corpus`` (Robertson's offer weight). The
    retrieval loop's second half: r01 answers the query, r04 improves
    it.

    Scale: the feedback set is {fb} rows (broadcast); candidate terms
    come from those documents only. The single corpus-sized stage is the
    distinct-terms explode for corpus document frequency, filtered by a
    broadcast semi-join on the candidate set BEFORE the shuffle — so
    only candidate-term occurrences (bounded by the feedback docs'
    vocabulary) ever reach an exchange; the final ranking is
    TakeOrderedAndProject."""
    from dibimbing_case_study_etl_spark.functions.text import tokens
    from dibimbing_case_study_etl_spark.queries.llm_ops7 import (
        _BM25_TERMS,
        r01_bm25_topk,
    )

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    fb = (
        r01_bm25_topk(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_R04_FB_DOCS)
        .select("doc_id")
    )
    fb_docs = docs.join(F.broadcast(fb), "doc_id")
    cand = (
        fb_docs.select(
            "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
        )
        .filter((F.col("tok") != "") & ~F.col("tok").isin(*_BM25_TERMS))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df_fb"))
        .localCheckpoint(eager=False)  # consumed by the corpus semi-join AND the final join
    )
    stats = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    cdf = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"))
        .join(F.broadcast(cand.select("tok")), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df_corpus"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df_corpus") + 0.5) / (F.col("df_corpus") + 0.5) + 1.0
    )
    return (
        cand.join(cdf, "tok")
        .crossJoin(stats)
        .select(
            F.col("tok").alias("term"),
            "df_fb",
            "df_corpus",
            iround(F.col("df_fb") * idf, 4).alias("offer_weight"),
        )
        .orderBy(F.col("offer_weight").desc(), "term")
        .limit(_R04_TOPK)
    )


# --- u13: the commit log hosted on object-store semantics ------------------

_U13_ORACLE = f"""
    WITH c AS (SELECT c_custkey AS k, c_acctbal AS p FROM customer),
    v0 AS (SELECT k, p FROM c),
    v1 AS (SELECT k, CASE WHEN k % 3 = 0 THEN p + 5 ELSE p END AS p FROM c),
    v2 AS (SELECT k, p FROM v1 WHERE k % 5 <> 0)
    SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys, {sql_dsum("p", 2)} AS total_bal
    FROM v0
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), {sql_dsum("p", 2)}
    FROM v1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(k) AS BIGINT), {sql_dsum("p", 2)}
    FROM v2
    ORDER BY version
"""


# store-call audit of the most recent u13 run (the LSH downgrade-counter
# pattern): the scale legs record it per run to prove the log protocol's
# "1 conditional PUT per commit + O(commits-since-checkpoint) GETs per
# snapshot + 1 paginated LIST per fold" cost model holds as data grows —
# store traffic must track COMMIT COUNT, not table size
LAST_U13_STORE_CALLS: dict | None = None


@query(
    "u13_txlog_object_store_roundtrip",
    oracle=_U13_ORACLE,
    tags=("warehouse", "acid", "objectstore"),
)
def u13_txlog_object_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u06's transactional lifecycle with the commit LOG hosted on
    object-store semantics end-to-end (r8 verdict ask #4 made
    driver-checkable): every publish is a conditional PutObject through
    :class:`~dibimbing_case_study_etl_spark.operators.txlog.S3CommitStore`
    and every log read (version listing, commit fetch, checkpoint seed)
    is ListObjectsV2/GetObject against the same in-process S3-semantics
    client — no commit JSON ever touches the filesystem (data parquet
    does; Spark's source reads it, which on a real deployment is the same
    bucket via s3a). An auto-checkpoint lands at version 2 and a COLD
    table handle (fresh fold through the store) reads all three versions;
    a replayed (app, batch) append must stay a no-op through the
    store-backed txn-watermark fold. The oracle rebuilds the three states
    arithmetically from ``customer``.

    Scale: identical data plane to u06 (distributed parquet, stats-pruned
    copy-on-write); the log adds one conditional PUT per commit and
    O(commits-since-checkpoint) GETs per snapshot — the Delta-on-S3
    posture since conditional writes shipped."""
    t = register(spark, sf_dir, ("customer",))
    c = t["customer"].select(
        F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("p")
    )
    root = tempfile.mkdtemp(prefix="txlog_u13_")
    try:
        from pathlib import Path

        from dibimbing_case_study_etl_spark.operators.txlog import (
            InMemoryS3Client,
            S3CommitStore,
        )

        client = InMemoryS3Client()
        store = S3CommitStore("warehouse", prefix="tables/c/", root=Path(root), client=client)
        table = TxLogTable.create(root, store=store, checkpoint_interval=2)
        table.append(c, key_col="k", txn=("loader", 1), target_files=4)
        # replay of the same batch: the store-backed watermark fold must
        # make this a no-op (no version 1 spawned)
        table.append(c, key_col="k", txn=("loader", 1), target_files=4)
        table.merge(
            spark,
            c.filter(F.col("k") % 3 == 0).withColumn("p", F.col("p") + F.lit(5.0)),
            "k",
            target_files=4,
        )
        table.merge(
            spark, c.filter(F.col("k") % 5 == 0), "k", delete=True, target_files=4
        )
        assert any(".checkpoint." in key for _, key in client.objects)
        # cold handle: a fresh fold of the log read purely through the store
        cold = TxLogTable(
            root,
            store=S3CommitStore(
                "warehouse", prefix="tables/c/", root=Path(root), client=client
            ),
        )
        versions = [
            cold.read(spark, as_of=v)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("k").alias("sum_keys"),
                dsum(F.col("p"), 2).alias("total_bal"),
            )
            .select(F.lit(v).cast("bigint").alias("version"), "*")
            for v in (0, 1, 2)
        ]
        out = versions[0].unionByName(versions[1]).unionByName(versions[2])
        result = out.orderBy("version").localCheckpoint(eager=True)
        global LAST_U13_STORE_CALLS
        LAST_U13_STORE_CALLS = {
            "puts": client.n_put,
            "gets": client.n_get,
            "lists": client.n_list,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result
