"""Round-5 additions: the Lloyd-step audit, matryoshka truncation recall,
and the perplexity quality gate.

Every clustering twin so far (s06r, d11r, s07r) pins the *structure* and
excludes the Lloyd refinement because distributed centroid means are
accumulation-order-dependent. ``s13`` closes exactly that gap: one full
Lloyd update, with the means computed through the order-independent
scaled-integer sum (``functions/oracle_safe.dsum``), so even the
refinement step is driver-hash-checkable.

``s14`` audits the matryoshka/dimension-truncation serving pattern (use
the first d′ ≪ d dimensions at query time, the full vector offline): the
per-query overlap between truncated-space and full-space exact top-k is
the recall number an MRL deployment publishes.

``t23`` turns t10's unigram-LM surprisal into the KenLM-style corpus
quality GATE: per-source counts of boilerplate-flagged (low surprisal),
gibberish-flagged (high surprisal), and kept documents, with the kept
mass's mean score — the action a curation pipeline actually takes.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl,
pandas+Postgres `scripts/`) has no vector or corpus-quality surface; this
family is part of the beyond-reference LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    iround,
    dsum,
    sql_dsum,
    sql_iround,
)
from dibimbing_case_study_etl_spark.queries import query

_K_CELLS = 16
_MEAN_DIMS = 4  # audit the first 4 centroid components (the table stays tiny)


def _kmeans_mean_cols() -> str:
    cols = []
    for i in range(_MEAN_DIMS):
        mean = sql_iround(sql_dsum(f"v[{i + 1}]", 6) + " / COUNT(*)", 4)
        cols.append(f"{mean} AS mean_d{i + 1}")
    return ",\n           ".join(cols)


def seeded_kmeans_assignment(vecs: DataFrame) -> DataFrame:
    """(vec_id, __v, cell): every vector assigned to its nearest seeded
    centroid — s06r's cell structure (the ``ncells`` lowest-id vectors,
    clamped sequential cosine, ties to the lower cell). Shared by s13
    (Lloyd audit) and s18 (label-purity eval) so both audit the SAME
    assignment."""
    from dibimbing_case_study_etl_spark.functions.vector import cosine

    cents = (
        vecs.orderBy("vec_id")
        .limit(_K_CELLS)
        .select(F.col("vec_id").alias("cell"), F.col("__v").alias("__cent"))
    )
    scored = vecs.join(F.broadcast(cents), F.lit(True)).withColumn(
        "__sim", cosine(F.col("__v"), F.col("__cent"))
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("__sim"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "__v", "cell")
    )


# DuckDB twin of seeded_kmeans_assignment — CTE text shared by the s13 and
# s18 oracles (both must see the identical assignment).
SQL_SEEDED_ASSIGNMENT = f"""vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell, v AS cv FROM vecs ORDER BY vec_id LIMIT {_K_CELLS}
    ),
    scored AS (
      SELECT vecs.vec_id, vecs.v, cents.cell,
             least(1.0, greatest(-1.0, list_cosine_similarity(v, cv))) AS sim
      FROM vecs CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM scored
      ) WHERE rn = 1
    )"""


@query(
    "s13_kmeans_lloyd_audit",
    oracle=f"""
    WITH {SQL_SEEDED_ASSIGNMENT}
    SELECT cell, COUNT(*) AS n_members,
           {_kmeans_mean_cols()}
    FROM assigned GROUP BY cell ORDER BY cell
    """,
    tags=("llm", "similarity", "clustering", "audit"),
)
def s13_kmeans_lloyd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd refinement step, driver-hash-checkable: assign every
    vector to its nearest seeded centroid (s06r's cell structure — the
    ``ncells`` lowest-id vectors, clamped sequential cosine, ties to the
    lower cell), then recompute the centroid means. This is the exact step
    every other clustering audit EXCLUDES as "accumulation-order-
    dependent"; routing the means through the order-independent
    scaled-integer sum (per-component 6-dp round → exact BIGINT sum →
    divide by count, :func:`oracle_safe.dsum`) makes the refinement itself
    deterministic on any partitioning — which is also the form a 100 TB
    k-means would want, since the result no longer depends on AQE or
    partition count.

    Scale: one broadcast of 16 centroids against the corpus scan, one
    partial-aggregable groupBy(cell) carrying 4 BIGINT sums + a count —
    nothing wider than the model ever shuffles.
    """
    from dibimbing_case_study_etl_spark.functions.vector import as_double

    t = register(spark, sf_dir, ("embeddings",))
    vecs = t["embeddings"].select("vec_id", as_double(F.col("embedding")).alias("__v"))
    assigned = seeded_kmeans_assignment(vecs)
    n = F.count(F.lit(1))
    return (
        assigned.groupBy("cell")
        .agg(
            n.alias("n_members"),
            *[
                iround(dsum(F.element_at("__v", i + 1), 6) / n, 4).alias(
                    f"mean_d{i + 1}"
                )
                for i in range(_MEAN_DIMS)
            ],
        )
        .orderBy("cell")
    )


_TRUNC_DIM = 16
_MRL_K = 10
_MRL_NQ = 20

_FULL_COS = (
    "least(1.0, greatest(-1.0, list_cosine_similarity(q.v, c.v)))"
)
_TRUNC_COS = (
    f"least(1.0, greatest(-1.0, list_cosine_similarity("
    f"q.v[1:{_TRUNC_DIM}], c.v[1:{_TRUNC_DIM}])))"
)


def _mrl_topk_cte(cos: str, alias: str) -> str:
    return f"""
    {alias} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos} DESC, c.vec_id
               ) AS rank
        FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_MRL_NQ}
      ) WHERE rank <= {_MRL_K}
    )"""


@query(
    "s14_dim_truncation_recall",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {_mrl_topk_cte(_FULL_COS, "full_k")},
    {_mrl_topk_cte(_TRUNC_COS, "trunc_k")}
    SELECT f.query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
           {sql_iround(f"COUNT(t.neighbor_id) / {_MRL_K}.0", 4)} AS recall_at_k
    FROM full_k f LEFT JOIN trunc_k t
      ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
    GROUP BY f.query_id ORDER BY f.query_id
    """,
    tags=("llm", "similarity", "audit"),
)
def s14_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation serving audit: per query,
    the overlap between the exact top-k under the first-16-dims cosine
    and the exact top-k under the full-dimension cosine — the
    recall@k an MRL deployment (truncated vectors at query time, full
    vectors offline) publishes before shipping. Both sides run the exact
    JVM sequential-fold cosine (bitwise-equal to the oracle's
    ``list_cosine_similarity``), so ranks are deterministic with the id
    tiebreak and the integer overlap counts are hash-stable.

    Scale: two broadcast-query passes over the corpus scan (s01's shape —
    the bounded query side is enforced upstream), one tiny join of two
    (nq·k)-row shortlists.
    """
    from dibimbing_case_study_etl_spark.operators.similarity import cosine_topk

    t = register(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < _MRL_NQ)
    full_k = cosine_topk(q, e, k=_MRL_K).select("query_id", "neighbor_id")
    trunc = e.select("vec_id", F.slice("embedding", 1, _TRUNC_DIM).alias("embedding"))
    trunc_k = cosine_topk(
        trunc.filter(F.col("vec_id") < _MRL_NQ), trunc, k=_MRL_K
    ).select(
        F.col("query_id").alias("__tq"), F.col("neighbor_id").alias("__tn")
    )
    return (
        full_k.join(
            trunc_k,
            (F.col("query_id") == F.col("__tq"))
            & (F.col("neighbor_id") == F.col("__tn")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("__tn").alias("n_overlap"),
            iround(F.count("__tn") / float(_MRL_K), 4).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# KenLM-style gate thresholds on t10's 4-dp mean unigram surprisal: below
# the low bar → boilerplate/degenerate repetition; above the high bar →
# gibberish/OCR noise. The synthetic corpus's per-doc score distribution is
# tight and SF-stable (p05 ≈ 3.394, p95 ≈ 3.423 at both sf0.001 and
# sf0.01); the bars sit at those tails so all three buckets are populated
# at every SF. Comparisons run on the already-4-dp-rounded score, so
# bucket membership is identical on both engines by construction.
_PPL_LOW = 3.394
_PPL_HIGH = 3.422


@query(
    "t23_perplexity_filter",
    oracle=None,  # composed below from t10's oracle — set after def
    tags=("llm", "text", "quality"),
)
def t23_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM quality GATE a curation pipeline actually applies:
    score every document with t10's mean surprisal (corpus-fit unigram
    model), bucket into boilerplate (score below the low bar) / kept /
    gibberish (score above the high bar), and report per-source counts plus the
    kept mass's mean score — the before/after evidence a data card cites
    for a KenLM-style perplexity filter. Composes t10 verbatim (its
    registered builder and its oracle), so the gate can never drift from
    the published score.

    Scale: t10's two shuffles (vocab agg, word→freq join) plus one
    source-keyed partial agg over per-doc rows; bucketing is stateless
    arithmetic on the already-rounded score, so the gate adds no new wide
    state.
    """
    t = register(spark, sf_dir, ("documents",))
    scored = t23_perplexity_filter.__wrapped_t10__(spark, sf_dir)
    docs = t["documents"].select("doc_id", "source")
    s = F.col("avg_surprisal")
    kept = (s >= _PPL_LOW) & (s <= _PPL_HIGH)
    return (
        docs.join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((s < _PPL_LOW).cast("bigint")).alias("n_boilerplate"),
            F.sum((s > _PPL_HIGH).cast("bigint")).alias("n_gibberish"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            # CASE-guarded: a source with zero kept docs yields NULL instead
            # of a 0/0 (Spark 4 ANSI raises DIVIDE_BY_ZERO on it)
            F.when(
                F.sum(kept.cast("bigint")) > 0,
                iround(dsum(F.when(kept, s), 4) / F.sum(kept.cast("bigint")), 4),
            ).alias("kept_mean_surprisal"),
        )
        .orderBy("source")
    )


# wire t10 in without a circular import and give t23 a composed oracle
from dibimbing_case_study_etl_spark.queries.llm_ops2 import (  # noqa: E402
    t10_unigram_surprisal as _t10,
)

t23_perplexity_filter.__wrapped_t10__ = staticmethod(_t10)

from dibimbing_case_study_etl_spark.queries import REGISTRY as _REG  # noqa: E402
import dataclasses as _dc  # noqa: E402

_t10_oracle = _REG["t10_unigram_surprisal"].oracle
_REG["t23_perplexity_filter"] = _dc.replace(
    _REG["t23_perplexity_filter"],
    oracle=f"""
    WITH scored AS ({_t10_oracle})
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(avg_surprisal < {_PPL_LOW} AS BIGINT)) AS BIGINT)
             AS n_boilerplate,
           CAST(SUM(CAST(avg_surprisal > {_PPL_HIGH} AS BIGINT)) AS BIGINT)
             AS n_gibberish,
           CAST(SUM(CAST(avg_surprisal BETWEEN {_PPL_LOW} AND {_PPL_HIGH}
                         AS BIGINT)) AS BIGINT)
             AS n_kept,
           CASE WHEN SUM(CAST(avg_surprisal BETWEEN {_PPL_LOW} AND {_PPL_HIGH}
                             AS BIGINT)) > 0
                THEN {sql_iround(
               sql_dsum(
                   f"CASE WHEN avg_surprisal BETWEEN {_PPL_LOW} AND {_PPL_HIGH}"
                   " THEN avg_surprisal END",
                   4,
               )
               + f" / SUM(CAST(avg_surprisal BETWEEN {_PPL_LOW} AND {_PPL_HIGH}"
               " AS BIGINT))",
               4,
           )} END AS kept_mean_surprisal
    FROM scored JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
)


# --- round-5 late additions: tokenizer training + weighted sampling --------

from dibimbing_case_study_etl_spark.functions.text import (  # noqa: E402
    EN_STOPWORDS,
    fingerprint,
    marker_score,
    sql_fingerprint,
    token_count,
)
from dibimbing_case_study_etl_spark.operators.bpe import (  # noqa: E402
    bpe_merges_df,
    bpe_token_stats,
    learn_bpe,
    learn_bpe_merges,
    sql_bpe_merges,
    sql_bpe_token_stats,
)
from dibimbing_case_study_etl_spark.queries.llm_ops import _sql_marker_score  # noqa: E402

_BPE_MERGES = 8


@query(
    "b01_bpe_merges",
    oracle=sql_bpe_merges(_BPE_MERGES),
    tags=("llm", "tokenizer", "iterative"),
)
def b01_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer TRAINING: learn the corpus's first 8 BPE merges
    (Sennrich-style — count adjacent symbol pairs weighted by word
    frequency, merge the argmax, repeat). t15/t20 encode with a fixed
    vocab; this is where that vocab comes from. The corpus is scanned
    once into a word-frequency table; every iteration is a vocab-sized
    pair count + TakeOrdered(1) with one argmax row on the driver —
    bounded state, like the Lloyd step (s13). The oracle replays all 8
    layers in SQL: same wrapped-symbol strings, same replace-based greedy
    merge (left-to-right non-overlap is identical in Spark, DuckDB, and
    Python — see operators/bpe.py)."""
    t = register(spark, sf_dir, ("documents",))
    return bpe_merges_df(spark, learn_bpe_merges(t["documents"], "text", _BPE_MERGES))


@query(
    "b02_bpe_token_stats",
    oracle=sql_bpe_token_stats(_BPE_MERGES),
    tags=("llm", "tokenizer", "iterative"),
)
def b02_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION, closing b01's loop: the tokenizer card a
    training team publishes after learning the merge table — vocab size,
    fertility (tokens per word occurrence), chars per token — computed
    from the post-merge word-frequency state itself, so the corpus is
    never rescanned (the word table already carries every occurrence
    count). All sums are partial-aggregable over the vocab-sized table;
    the distinct symbol count explodes the same table and joins back as a
    broadcast single-row agg. The oracle replays the identical 8 merge
    layers and aggregates the final layer."""
    t = register(spark, sf_dir, ("documents",))
    merges, words = learn_bpe(t["documents"], "text", _BPE_MERGES)
    # words is a lazy checkpoint; the caller's action materializes it and
    # the ContextCleaner reclaims it — no eager copy of the result needed
    return bpe_token_stats(words)


@query(
    "t24_quality_weighted_sample",
    oracle=f"""
    WITH base AS (
      SELECT source,
             CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS n_tokens,
             {_sql_marker_score(EN_STOPWORDS)} AS n_stop,
             {sql_fingerprint('text')} % 10000 AS bucket
      FROM documents
    ),
    thr AS (
      SELECT source, n_tokens, bucket,
             CAST(round_even((0.5 * (n_stop / n_tokens)
                              + 0.5 * LEAST(1.0, n_tokens / 100.0)) * 10000, 0)
                  AS BIGINT) AS keep_thr
      FROM base
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CAST(bucket < keep_thr AS BIGINT)) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN bucket < keep_thr THEN n_tokens END), 0)
                AS BIGINT) AS kept_tokens,
           {sql_iround('SUM(CAST(bucket < keep_thr AS BIGINT)) / COUNT(*)', 4)}
             AS sample_rate,
           {sql_iround('SUM(keep_thr) / 10000.0 / COUNT(*)', 4)} AS target_rate
    FROM thr
    GROUP BY source ORDER BY source
    """,
    tags=("llm", "sampling"),
)
def t24_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: each document is kept with
    probability equal to its t02 quality score, decided by a DETERMINISTIC
    content-hash bucket (``fingerprint(text) % 10000 < rint(q·10000)``) —
    no RNG, so the sample is reproducible across runs, engines, and
    cluster layouts, and any node can re-derive membership locally (the
    property a 100 TB pipeline needs to re-materialize a sample without a
    stored id list). Per-source accounting compares the ACHIEVED rate
    against the target (mean quality) — the drift check a weighted
    sampler ships with. Single scan, one partial agg; zero shuffle beyond
    the source-keyed final agg."""
    t = register(spark, sf_dir, ("documents",))
    n_tokens = token_count(F.col("text"))
    n_stop = marker_score(F.col("text"), EN_STOPWORDS)
    q_raw = 0.5 * (n_stop / n_tokens) + 0.5 * F.least(F.lit(1.0), n_tokens / 100.0)
    keep_thr = F.call_function("rint", q_raw * 10000).cast("bigint")
    bucket = F.pmod(fingerprint("text"), F.lit(10000))
    keep = (bucket < keep_thr).cast("bigint")
    scored = t["documents"].select(
        "source", n_tokens.alias("n_tokens"), keep.alias("keep"), keep_thr.alias("keep_thr")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("keep") == 1, F.col("n_tokens"))), F.lit(0)
            ).alias("kept_tokens"),
            iround(F.sum("keep") / F.count(F.lit(1)), 4).alias("sample_rate"),
            iround(F.sum("keep_thr") / 10000.0 / F.count(F.lit(1)), 4).alias("target_rate"),
        )
        .orderBy("source")
    )


# --- provenance + dedup accounting ------------------------------------------

from dibimbing_case_study_etl_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from dibimbing_case_study_etl_spark.queries.llm_ops import (  # noqa: E402
    _SQL_SHINGLE_CTE,
)


@query(
    "d16_cross_source_contamination",
    oracle=f"""
    WITH {_SQL_SHINGLE_CTE},
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
    ),
    lab AS (
      SELECT da.source AS sa, db.source AS sb
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT LEAST(sa, sb) AS source_a, GREATEST(sa, sb) AS source_b,
           COUNT(*) AS n_pairs
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("llm", "dedup", "provenance"),
)
def d16_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: which source pairs share
    near-duplicate documents (word-3-gram Jaccard >= 0.8) — the provenance
    audit a curation team runs before assigning per-source mixture weights
    (t12), since two "independent" sources that mirror each other would
    otherwise be double-weighted. Pairs come from the LSH scale path
    (d03 — same set as the exact oracle, miss probability ~5e-8, the d06
    argument); source labels join back on the 8-byte doc id, so the only
    text-bearing shuffle is the one inside the pair builder. Output is
    source-pair-bounded (|sources|^2 at worst), orderable and tiny."""
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "source")
    prs = minhash_lsh_pairs(t["documents"], "doc_id", "text", k=3, threshold=0.8)
    lab = (
        prs.join(docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")), "doc_a")
        .join(docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")), "doc_b")
    )
    return (
        lab.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@query(
    "t25_dedup_token_accounting",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLE_CTE},
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    lab AS (
      SELECT d.source, d.doc_id,
             CAST(len(regexp_split_to_array(trim(d.text), ' +')) AS BIGINT) AS nt,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.source, d.doc_id, d.text
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_kept,
           CAST(COALESCE(SUM(CASE WHEN doc_id = cluster_id THEN nt END), 0)
                AS BIGINT) AS n_tokens_kept
    FROM lab GROUP BY source ORDER BY source
    """,
    tags=("llm", "dedup", "accounting", "iterative"),
)
def t25_dedup_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware token accounting: per source, how many documents and
    whitespace tokens survive near-dup clustering (d06's keeper rule —
    keep a cluster's minimum doc id). This is the budget table a curator
    reads after a dedup run; the per-source kept-token mass is what
    actually feeds the mixture weights (t12), and a source whose token
    mass collapses here is a mirror, not a corpus. Pairs come from the
    LSH scale path and labels from the distributed min-propagation
    (the d06 argument); the accounting itself is one narrow id join plus
    a source-keyed partial agg."""
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    from dibimbing_case_study_etl_spark.operators.dedup import dedup_clusters

    prs = minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    clusters = dedup_clusters(docs, prs, "doc_id")
    base = docs.select("source", "doc_id", token_count(F.col("text")).alias("nt"))
    flagged = base.join(clusters, "doc_id")
    kept = (F.col("doc_id") == F.col("cluster_id")).cast("bigint")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum(kept).alias("n_docs_kept"),
            F.coalesce(F.sum(F.when(kept == 1, F.col("nt"))), F.lit(0)).alias(
                "n_tokens_kept"
            ),
        )
        .orderBy("source")
    )


@query(
    "d17_quality_keeper_resolution",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLE_CTE},
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    lab AS (
      SELECT d.doc_id, d.text,
             LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      GROUP BY d.doc_id, d.text
    ),
    scored AS (
      SELECT doc_id, cluster_id,
             CAST(round_even((0.5 * ({_sql_marker_score(EN_STOPWORDS)}
                                     / len(regexp_split_to_array(trim(text), ' +')))
                              + 0.5 * LEAST(1.0, len(regexp_split_to_array(trim(text), ' +')) / 100.0))
                             * 10000, 0) AS BIGINT) AS q_i
      FROM lab
    ),
    sel AS (
      SELECT doc_id, cluster_id, q_i,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY q_i DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS c
      FROM scored
    )
    SELECT cluster_id, CAST(c AS BIGINT) AS n_members,
           doc_id AS keeper_id, q_i AS keeper_q_e4
    FROM sel WHERE rn = 1 AND c >= 2 ORDER BY cluster_id
    """,
    tags=("llm", "dedup", "iterative"),
)
def d17_quality_keeper_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority dedup resolution: within each near-dup cluster keep
    the HIGHEST-QUALITY member (t02's quality score, scaled to an integer
    e4 so the argmax is engine-exact; ties to the lower doc id) — the
    keeper policy a production pipeline actually wants, vs d07's min-id
    rule which can keep the boilerplate copy and drop the clean one.
    Clusters come from the LSH pair path + distributed min-label
    propagation (the d06 argument). The per-cluster argmax is ONE
    partial-aggregable max_by over a (cluster_id, q_i, doc_id) table —
    no window over the corpus; the oracle's ROW_NUMBER is the same
    selection in single-node form."""
    from dibimbing_case_study_etl_spark.operators.dedup import dedup_clusters

    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    prs = minhash_lsh_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    clusters = dedup_clusters(docs, prs, "doc_id")
    n_tokens = token_count(F.col("text"))
    n_stop = marker_score(F.col("text"), EN_STOPWORDS)
    q_raw = 0.5 * (n_stop / n_tokens) + 0.5 * F.least(F.lit(1.0), n_tokens / 100.0)
    q_i = F.call_function("rint", q_raw * 10000).cast("bigint")
    scored = docs.select("doc_id", q_i.alias("q_i")).join(clusters, "doc_id")
    return (
        scored.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(
                F.col("doc_id"), F.struct(F.col("q_i"), (-F.col("doc_id")).alias("nd"))
            ).alias("keeper_id"),
            F.max("q_i").alias("keeper_q_e4"),
        )
        .filter(F.col("n_members") >= 2)
        .select("cluster_id", "n_members", "keeper_id", "keeper_q_e4")
        .orderBy("cluster_id")
    )
