"""Round-5 late additions II: span-level dedup, retrieval, model-based
quality, graph centrality, and seq2seq data prep.

- ``t26`` closes the dedup family's *granularity* ladder: the span-level
  REMOVAL accounting of Lee et al. 2022 ("Deduplicating Training Data
  Makes Language Models Better") — every ≥K-token window occurring more
  than once is deleted everywhere except its globally-first occurrence;
  per-document merged spans + token savings.
- ``r01`` opens the retrieval class: Okapi BM25 (the Lucene/Elasticsearch
  practical scoring function) top-k for a query term set — t17 ranks a
  document's own terms; r01 answers a QUERY.
- ``t27`` is the learned-classifier quality gate (fastText/VW hashing
  trick — the weight is a function of the token hash, so inference is a
  map-side integer dot product with no vocab join).
- ``g01`` is the registry's first fixpoint graph algorithm: PageRank over
  the deterministic k-NN embedding graph in exact BIGINT mass arithmetic.
- ``t28`` plans T5 span corruption (the md5 position hash IS the noise
  stream): per-document encoder/decoder lengths for seq2seq packing.
- ``t29`` is the Gopher rule bundle (Rae et al. 2021): named filter rules
  as per-source audit counters.

Reference parity: the reference repo (caesarmario/dibimbing-case-study-etl,
pandas+Postgres `scripts/`) has none of these surfaces; the family
belongs to the beyond-reference LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import token_count, tokens, word_ngrams
from dibimbing_case_study_etl_spark.operators.similarity import knn_graph
from dibimbing_case_study_etl_spark.queries import query

# Span length for exact-substring dedup. Lee et al. use 50 BPE tokens on
# web-scale crawl; the synthetic corpus averages ~60 words, so K=8 keeps
# the operator's decision structure (overlap, keeper, merge) exercised.
_SPAN_K = 8


@query(
    "t26_substring_dedup_spans",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    occ AS (
      SELECT doc_id, i AS pos,
             CAST(('0x' || substr(md5(
               array_to_string(list_slice(w, i, i + {_SPAN_K - 1}), ' ')), 1, 15)) AS BIGINT) AS g
      FROM d, LATERAL unnest(generate_series(1, greatest(len(w) - {_SPAN_K - 1}, 0))) AS u(i)
    ),
    ranked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY g) AS n_occ,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      FROM occ
    ),
    rem AS (
      SELECT doc_id, pos AS s, pos + {_SPAN_K - 1} AS e
      FROM ranked WHERE n_occ >= 2 AND rn > 1
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s <= COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 0 ELSE 1 END AS ni
      FROM rem
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, island, MIN(s) AS ss, MAX(e) AS ee
      FROM isl GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(ee - ss + 1) AS BIGINT) AS n_dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.n_dup_tokens, 0) AS n_dup_tokens,
           CASE WHEN len(d.w) > 0
                THEN {sql_iround("COALESCE(p.n_dup_tokens, 0) / CAST(len(d.w) AS DOUBLE)", 6)}
                ELSE 0.0 END AS dup_token_frac
    FROM d LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("llm", "dedup", "text"),
    bench=True,
)
def t26_substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring removal accounting (Lee et al. 2022):
    every {K}-token window that occurs ≥2 times anywhere in the corpus is
    removed at every occurrence EXCEPT the globally-first one (min
    (doc_id, pos)). Overlapping/adjacent removal windows merge into
    contiguous spans; the output is each document's span count, removed
    token count, and removed fraction — the rewrite plan a substring-dedup
    pass executes. Span-level granularity is what d01/d03 (document
    level) and d12 (a scalar overlap score) cannot express.

    Scale shape (cost O(total windows), never O(docs²)):

    1. ONE scan tokenizes and emits positional {K}-gram occurrences
       (posexplode over `word_ngrams`, which preserves document order);
       `localCheckpoint` materializes the occurrence set because both the
       frequency/keeper aggregate and the join-back consume it (the d12
       lesson: ReuseExchange cannot be trusted across a partial-agg arm).
    2. per-gram frequency AND keeper come from a single partial-aggregable
       `groupBy(gram)` — `min(struct(doc_id, pos))` is the keeper, so a
       boilerplate gram that floods the corpus costs one partial row per
       input partition, never a hot window partition (a `row_number() over
       (partition by gram)` — the oracle's single-node formulation — would
       put the hottest gram's every occurrence in one task; AQE can split
       a skewed JOIN but not a skewed WINDOW).
    3. occurrences ⋈ gram-info on gram: build side unique-per-key,
       AQE-skew-splittable; only `n_occ >= 2` survivors keep flowing.
    4. interval merge runs per-DOCUMENT (windows partitioned by doc_id,
       bounded by document length — no skew), then one doc-keyed agg.

    The keeper rule needs no global sort: `min(struct)` is associative,
    so the "first occurrence in corpus order" is decided by merge, not by
    ordering the corpus.
    """
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))

    occ = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(F.col("text"), _SPAN_K)).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        # shuffle the 60-bit md5 gram key, not the gram string (Lee et al.
        # hash their windows too): 8-byte shuffle rows, measured 2x at
        # sf1, collision odds ~2^-60 per pair — the d04r cross-engine hash
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long").alias("g"),
    )
    occ = occ.localCheckpoint(eager=True)

    info = occ.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    rem = (
        occ.join(info.filter(F.col("n_occ") >= 2), "g")
        .filter(
            ~(
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("pos") == F.col("keeper.pos"))
            )
        )
        .select("doc_id", F.col("pos").alias("s"), (F.col("pos") + _SPAN_K - 1).alias("e"))
    )

    w = W.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    spans = (
        rem.withColumn(
            "ni",
            F.when(F.col("s") <= F.coalesce(prev_max, F.lit(-2)) + 1, 0).otherwise(1),
        )
        .withColumn("island", F.sum("ni").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("ss"), F.max("e").alias("ee"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("ee") - F.col("ss") + 1).alias("n_dup_tokens"),
    )
    return toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("bigint").alias("n_dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            iround(
                F.coalesce("n_dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )


# Okapi BM25 constants (the Lucene/Elasticsearch defaults) and a fixed
# mid-document-frequency query term set from the synthetic vocabulary.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("merge", "window", "stream", "filter")
_BM25_TOPK = 50


# Module-level so r03 (reciprocal-rank fusion) can embed the identical
# BM25 ranking as a subquery of its own oracle.
_R01_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(w)) AS BIGINT) AS sum_dl
      FROM d
    ),
    tok AS (
      SELECT doc_id, len(w) AS dl, unnest(w) AS tok FROM d
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok
      WHERE tok IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY doc_id, dl, tok
    ),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    term_scores AS (
      SELECT tf.doc_id,
             CAST(round_even(
               ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * {_BM25_K1 + 1.0}
               / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B}
                  + {_BM25_B} * tf.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
               * 10000, 0) AS BIGINT) AS s_i
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats s
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(s_i) AS BIGINT) / 10000.0 AS score
    FROM term_scores
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


def bm25_term_freq(docs: DataFrame) -> DataFrame:
    """Query-term frequency table ``(doc_id, dl, tok, tf)``: ONE corpus
    explode, term filter immediately after (only query-term occurrences
    reach the shuffle), doc length riding along. Shared by r01 and r03 —
    the fusion query computes it once, checkpoints it, and feeds BOTH
    rankers, instead of each ranker re-exploding the corpus."""
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("dl"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "r01_bm25_topk",
    oracle=_R01_ORACLE,
    tags=("llm", "retrieval", "text"),
    bench=True,
)
def r01_bm25_topk(
    spark: SparkSession, sf_dir: str, tf_table: DataFrame | None = None
) -> DataFrame:
    """Okapi BM25 top-{k} retrieval for a fixed query term set — the
    Lucene/Elasticsearch practical scoring function (idf = ln((N-df+0.5)/
    (df+0.5)+1), tf saturation k1={k1}, length normalization b={b}).
    Keyword retrieval over the corpus is the surface hard-negative mining
    and corpus exploration use; no other registry query answers a query
    against the documents.

    Scale shape:

    1. doc length rides ALONG the explode (`token_count` selected next to
       `posexplode`'s sibling columns) — no corpus-sized dl join later;
    2. the term filter hits immediately after the explode, so only
       query-term occurrences (|terms| ≪ vocab) reach the first shuffle;
       partial aggregation combines map-side per (doc, term);
    3. document frequency is a ≤|terms|-row aggregate, broadcast back;
       corpus stats (N, Σdl) are a one-row aggregate broadcast via
       crossJoin — exact BIGINT sums, so avgdl is the same double on both
       engines;
    4. per-term scores round to scaled BIGINT *before* the per-doc sum
       (order-independent, `functions/oracle_safe` discipline), and the
       final top-k compiles to TakeOrderedAndProject — k rows per
       partition, never a global sort.
    """
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")

    stats = F.broadcast(
        docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("sum_dl"),
        )
    )
    tf = tf_table if tf_table is not None else bm25_term_freq(docs)
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (F.col("tf") + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * F.col("dl") / avgdl))
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(stats)
        .select(
            "doc_id",
            F.call_function("rint", term_score * 10000).cast("bigint").alias("s_i"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (F.sum("s_i") / 10000.0).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


# Hashing-trick linear classifier: weights are derived arithmetically from
# the 60-bit md5 token hash (the d04r cross-engine hash), standing in for a
# trained fastText-style weight vector. A production deployment swaps the
# arithmetic for a broadcast hash→weight map lookup — the plan shape
# (explode → distinct features → partial-agg dot product) is identical.
_CLF_WRANGE = 2001  # weights span [-1000, 1000] in milli-units


@query(
    "t27_hashed_quality_classifier",
    oracle=f"""
    WITH feats AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        FROM documents
      )
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_features,
             CAST(SUM((CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                       % {_CLF_WRANGE}) - 1000) AS BIGINT) AS wsum
      FROM feats GROUP BY doc_id
    )
    SELECT doc_id, n_features,
           {sql_iround("1.0 / (1.0 + exp(-(wsum / (1000.0 * sqrt(n_features)))))", 4)}
             AS score,
           {sql_iround("1.0 / (1.0 + exp(-(wsum / (1000.0 * sqrt(n_features)))))", 4)} >= 0.5
             AS keep
    FROM scored
    """,
    tags=("llm", "quality", "text"),
)
def t27_hashed_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document quality scoring via the hashing trick: a
    linear classifier over binary bag-of-words features whose weight for a
    token is a deterministic function of its 60-bit md5 hash (fastText /
    Vowpal-Wabbit architecture; CCNet's quality-classifier stage). t02
    scores documents with hand-written heuristics — this is the learned
    -classifier twin: sigmoid(w·x / (‖w‖-scale · √n)) with a keep/drop
    decision at 0.5. Swapping the arithmetic weights for trained ones is a
    broadcast map join; nothing else in the plan changes.

    Scale: one explode → `array_distinct` BEFORE the explode keeps the
    shuffle to distinct (doc, token) pairs; the dot product is a
    partial-aggregable integer SUM (weights are exact milli-unit ints, so
    accumulation order cannot flip the hash); sqrt/exp run on
    bit-identical integer-derived doubles, rounded half-even at 4 dp
    (`functions/oracle_safe` discipline). No weight table is shuffled —
    the hash IS the lookup, which at 100 TB is the difference between a
    map-side transform and a vocab-sized join.
    """
    t = register(spark, sf_dir, ("documents",))
    feats = t["documents"].select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    )
    w_i = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % _CLF_WRANGE
    ) - 1000
    logit = F.col("wsum") / (1000.0 * F.sqrt(F.col("n_features")))
    score = iround(1.0 / (1.0 + F.exp(-logit)), 4)
    return (
        feats.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(w_i).alias("wsum"),
        )
        .select(
            "doc_id",
            "n_features",
            score.alias("score"),
            (score >= 0.5).alias("keep"),
        )
    )


# PageRank over the deterministic k-NN graph (the s09r edge recipe). All
# mass arithmetic is exact BIGINT: a total mass of 10^12 units splits
# floor-division-ally, so every engine computes bit-identical ranks — no
# float accumulation anywhere.
_PR_SCALE = 1_000_000_000_000
_PR_K = 5  # out-degree: top-5 neighbors, s09r's published cut
_PR_ITERS = 3

_PR_EDGE_COS = "least(1.0, greatest(-1.0, list_cosine_similarity(a.v, b.v)))"


def _pagerank_oracle() -> str:
    from dibimbing_case_study_etl_spark.functions.oracle_safe import sql_iround as _ir

    it_prev = "pr0"
    its = []
    for i in range(1, _PR_ITERS + 1):
        its.append(
            f"""it{i} AS (
      SELECT v.vec_id,
             ((15 * ({_PR_SCALE} // s.n)) // 100)
             + (85 * COALESCE(x.sm, 0)) // 100 AS p
      FROM vecs v CROSS JOIN stats s
      LEFT JOIN (SELECT e.dst, CAST(SUM(p.p // {_PR_K}) AS BIGINT) AS sm
                 FROM edges e JOIN {it_prev} p ON e.src = p.vec_id
                 GROUP BY e.dst) x
        ON v.vec_id = x.dst
    )"""
        )
        it_prev = f"it{i}"
    return f"""
    WITH vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vecs),
    edges AS (
      SELECT vec_id AS src, neighbor_id AS dst FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_ir(_PR_EDGE_COS, 6)} DESC, b.vec_id
               ) AS INTEGER) AS rank
        FROM vecs a JOIN vecs b ON a.vec_id <> b.vec_id
      ) WHERE rank <= {_PR_K}
    ),
    indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_in FROM edges GROUP BY dst),
    pr0 AS (SELECT vec_id, ({_PR_SCALE} // n) AS p FROM vecs, stats),
    {",".join(its)}
    SELECT v.vec_id,
           COALESCE(i.n_in, 0) AS n_in,
           f.p AS pr_unit
    FROM vecs v
    JOIN {it_prev} f ON v.vec_id = f.vec_id
    LEFT JOIN indeg i ON v.vec_id = i.dst
    """


@query(
    "g01_pagerank_knn_graph",
    oracle=_pagerank_oracle(),
    tags=("llm", "graph", "similarity"),
)
def g01_pagerank_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {iters} iterations) over the directed k-NN
    embedding graph — the centrality signal semantic-curation pipelines
    use to find hub documents and representative cluster exemplars
    (SemDeDup-adjacent corpus pruning keeps high-centrality members). The
    registry's first ITERATIVE graph algorithm: d06's label propagation
    converges on components; this is fixpoint iteration with per-step
    redistribution.

    Determinism without floats: total rank mass is 10^12 integer units;
    each step gives every node `(15% of uniform) + 85% of the floor-split
    in-flow` using BIGINT floor division only — both engines compute
    bit-identical units, so the driver hash covers the *values*, not a
    rounding of them. Edges are the s09r recipe (block-pair-GEMM k-NN at
    2× oversample, re-ranked on 6-dp rounded cosine with id tiebreak —
    the published deterministic cut).

    Scale: edges `localCheckpoint`ed once (every iteration re-reads them;
    lineage would otherwise re-run the GEMM per step) and each iteration's
    rank table is checkpointed too — fixpoint loops must truncate lineage
    or the plan deepens linearly and re-plans quadratically. Per step:
    one edge⋈rank join on src (rank side is node-sized), one partial-agg
    sum on dst, one node-sized left join. Out-degree is the constant k,
    so contribution splitting is map-side arithmetic, and a hub's in-flow
    is a partial-aggregable SUM, never a hot window.
    """
    t = register(spark, sf_dir, ("embeddings",))
    vecs = t["embeddings"].select("vec_id", "embedding")

    base = knn_graph(vecs, k=2 * _PR_K)
    w = W.partitionBy("vec_id").orderBy(F.desc("__r"), F.asc("neighbor_id"))
    edges = (
        base.withColumn("__r", iround(F.col("cos_sim"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PR_K)
        .select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = vecs.select("vec_id")
    n = nodes.count()
    base_mass = (15 * (_PR_SCALE // n)) // 100

    pr = nodes.select("vec_id", F.lit(_PR_SCALE // n).cast("long").alias("p"))
    for _ in range(_PR_ITERS):
        insum = (
            edges.join(pr, edges.src == pr.vec_id)
            .select("dst", F.expr(f"p div {_PR_K}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sm"))
        )
        pr = (
            nodes.join(insum, nodes.vec_id == insum.dst, "left")
            .select(
                "vec_id",
                (F.lit(base_mass) + F.expr("(85 * coalesce(sm, 0L)) div 100")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n_in"))
    return (
        pr.join(indeg, pr.vec_id == indeg.dst, "left")
        .select(
            "vec_id",
            F.coalesce("n_in", F.lit(0)).cast("bigint").alias("n_in"),
            F.col("p").alias("pr_unit"),
        )
    )


# T5-style span corruption: deterministic noise — position i starts a mask
# span iff its 60-bit md5 position hash ≡ 0 (mod 20) (≈5% of positions);
# span length = 2 + (hash/20 mod 3) ∈ {2,3,4} (mean 3 → ≈15% of tokens
# masked, the T5 defaults). Overlapping spans merge, exactly as the T5
# preprocessor's noise mask does.
_T28_RATE = 20
_T28_MINLEN = 2


@query(
    "t28_span_corruption_plan",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    pos AS (
      SELECT doc_id, len(w) AS n_tokens, i,
             CAST(('0x' || substr(md5(doc_id || ':' || i), 1, 15)) AS BIGINT) AS h
      FROM d, LATERAL unnest(generate_series(1, len(w))) AS u(i)
    ),
    starts AS (
      SELECT doc_id, n_tokens, i AS s,
             least(i + {_T28_MINLEN - 1} + ((h // {_T28_RATE}) % 3), n_tokens) AS e
      FROM pos WHERE h % {_T28_RATE} = 0
    ),
    flagged AS (
      SELECT doc_id, n_tokens, s, e,
             CASE WHEN s <= COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 0 ELSE 1 END AS ni
      FROM starts
    ),
    isl AS (
      SELECT doc_id, n_tokens, s, e,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, island, MIN(s) AS ss, MAX(e) AS ee
      FROM isl GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(ee - ss + 1) AS BIGINT) AS n_masked
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(d.w) AS BIGINT) AS n_tokens,
           COALESCE(p.n_spans, 0) AS n_spans,
           COALESCE(p.n_masked, 0) AS n_masked,
           CAST(len(d.w) AS BIGINT) - COALESCE(p.n_masked, 0) + COALESCE(p.n_spans, 0)
             AS encoder_len,
           COALESCE(p.n_masked, 0) + COALESCE(p.n_spans, 0) + 1 AS decoder_len
    FROM d LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("llm", "text", "seq2seq"),
)
def t28_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption accounting (Raffel et al. 2020): a
    deterministic ≈15% noise mask in mean-length-3 spans per document,
    merged into contiguous sentinel spans, reported as the per-document
    encoder/decoder sequence lengths (enc = kept tokens + one sentinel per
    span; dec = masked tokens + sentinels + EOS). These lengths ARE the
    seq2seq batch-packing input — computing them corpus-wide without
    materializing the corrupted text is the planning pass a pretraining
    data pipeline runs before t11's sequence packing.

    Determinism without RNG: the mask is a pure function of
    (doc_id, position) through the 60-bit md5 hash (d04r's cross-engine
    hash), so every engine — and every re-run — draws the same noise. The
    hash IS the random stream, the seed is the position: reproducible data
    prep with no stored mask.

    Scale: positions explode from `sequence(1, n)` (no token payload
    carried — the mask never looks at the words); ~5% survive the start
    filter before anything shuffles; span merge is the t26 interval
    machinery (per-DOCUMENT windows, bounded by doc length); one doc-keyed
    agg + a map-side arithmetic projection. Pure JVM codegen end to end.
    """
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text")
    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))

    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", "doc_id", "i")), 1, 15), 16, 10
    ).cast("long")
    starts = (
        toks.select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(1), F.col("n_tokens"))).alias("i"),
        )
        .withColumn("h", h)
        .filter(F.col("h") % _T28_RATE == 0)
        .select(
            "doc_id",
            "n_tokens",
            F.col("i").alias("s"),
            F.least(
                # integer div, not `/`: a 60-bit hash over DOUBLE division
                # loses low bits past 2^53 and desyncs the span length
                F.col("i") + (_T28_MINLEN - 1) + F.expr(f"(h div {_T28_RATE}) % 3"),
                F.col("n_tokens"),
            ).alias("e"),
        )
    )
    w = W.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    spans = (
        starts.withColumn(
            "ni",
            F.when(F.col("s") <= F.coalesce(prev_max, F.lit(-2)) + 1, 0).otherwise(1),
        )
        .withColumn("island", F.sum("ni").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("ss"), F.max("e").alias("ee"))
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("ee") - F.col("ss") + 1).alias("n_masked"),
    )
    n_spans = F.coalesce("n_spans", F.lit(0)).cast("bigint")
    n_masked = F.coalesce("n_masked", F.lit(0)).cast("bigint")
    return toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        n_spans.alias("n_spans"),
        n_masked.alias("n_masked"),
        (F.col("n_tokens") - n_masked + n_spans).alias("encoder_len"),
        (n_masked + n_spans + 1).alias("decoder_len"),
    )


# Gopher rule bundle (Rae et al. 2021, Appendix A): published, named
# filter rules with per-rule audit counters. Thresholds adapted to the
# synthetic corpus's ranges so every rule has live pass/fail signal.
_T29_MIN_WORDS = 30
_T29_MAX_WORDS = 1000
_T29_MIN_MWL = 4.0
_T29_MAX_MWL = 5.0
_T29_STOPWORDS = ("a", "the")


@query(
    "t29_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ),
    flags AS (
      SELECT source,
             (len(w) < {_T29_MIN_WORDS} OR len(w) > {_T29_MAX_WORDS}) AS f_nwords,
             (length(array_to_string(w, '')) / CAST(len(w) AS DOUBLE) < {_T29_MIN_MWL}
              OR length(array_to_string(w, '')) / CAST(len(w) AS DOUBLE) > {_T29_MAX_MWL})
               AS f_mwl,
             NOT (list_contains(w, 'a') AND list_contains(w, 'the')) AS f_stop
      FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f_nwords THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_count,
           CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_word_len,
           CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopword,
           CAST(SUM(CASE WHEN NOT (f_nwords OR f_mwl OR f_stop) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           {sql_iround(
               "SUM(CASE WHEN NOT (f_nwords OR f_mwl OR f_stop) THEN 1 ELSE 0 END)"
               " / CAST(COUNT(*) AS DOUBLE)", 6)} AS pass_rate
    FROM flags
    GROUP BY source
    """,
    tags=("llm", "quality", "text"),
)
def t29_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule bundle (Rae et al. 2021): the NAMED,
    published filter rules — word-count bounds, mean-word-length bounds,
    stopword presence — each reported as its own per-source failure
    counter plus the all-rules pass rate. t02 collapses heuristics into
    one opaque score and t27 into one learned logit; this is the
    auditable rule table a curation team actually reviews and tunes
    (thresholds sit in module constants, one per published rule).

    Scale: pure map-stage flags (the split binds once; mean word length
    is `length(array_join(w,''))/n` on exact ints, so threshold compares
    are engine-deterministic) into one |sources|-keyed partial agg — the
    whole audit is one scan and a ~20-row shuffle at any corpus size.
    """
    t = register(spark, sf_dir, ("documents",))

    def build(w):
        n = F.size(w)
        mwl = F.length(F.array_join(w, "")) / n.cast("double")
        return F.struct(
            ((n < _T29_MIN_WORDS) | (n > _T29_MAX_WORDS)).alias("f_nwords"),
            ((mwl < _T29_MIN_MWL) | (mwl > _T29_MAX_MWL)).alias("f_mwl"),
            (
                ~(
                    F.array_contains(w, _T29_STOPWORDS[0])
                    & F.array_contains(w, _T29_STOPWORDS[1])
                )
            ).alias("f_stop"),
        )

    st = F.element_at(F.transform(F.array(tokens(F.col("text"))), build), 1)
    flags = t["documents"].select("source", st.alias("st"))
    f_nwords, f_mwl, f_stop = (F.col(f"st.{c}") for c in ("f_nwords", "f_mwl", "f_stop"))
    n_pass = F.sum((~(f_nwords | f_mwl | f_stop)).cast("bigint"))
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(f_nwords.cast("bigint")).alias("n_fail_word_count"),
        F.sum(f_mwl.cast("bigint")).alias("n_fail_mean_word_len"),
        F.sum(f_stop.cast("bigint")).alias("n_fail_stopword"),
        n_pass.alias("n_pass"),
        iround(n_pass / F.count(F.lit(1)).cast("double"), 6).alias("pass_rate"),
    )
