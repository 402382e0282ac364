"""Second LLM-data-pipeline batch:

- d09: train/test decontamination — the standard "does any training
  document share n-grams with the held-out set" sweep every serious
  training pipeline runs before a launch.
- t07: deterministic stratified sampling — per-language sampling rates
  applied by content hash, so the sample is reproducible across runs,
  partitionings, and engines.

Both reuse the cross-engine primitives from ``functions/text.py``
(``word_shingles`` ↔ the DuckDB shingle CTE, ``fingerprint`` ↔
``sql_fingerprint``), so they are exact-oracle-checked like the rest of
the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import (
    dsum,
    iround,
    sql_dsum,
    sql_iround,
)
from dibimbing_case_study_etl_spark.functions.text import (
    fingerprint,
    sql_fingerprint,
    tokens,
    word_shingles,
)
from dibimbing_case_study_etl_spark.queries import query

_MAX_DF = 50  # stop-shingle cutoff: shingles in more docs than this are noise
_MIN_SHARED = 2  # contamination evidence: ≥ this many distinct shared shingles

_D09_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), ' +') AS w,
             ({sql_fingerprint("text")}) % 100 AS b
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, b,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM tok
    ),
    keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) <= {_MAX_DF}),
    tr AS (SELECT doc_id AS train_doc, s FROM sh JOIN keep USING (s) WHERE b < 90),
    te AS (SELECT doc_id AS test_doc, s FROM sh JOIN keep USING (s) WHERE b >= 90)
    SELECT train_doc, test_doc, COUNT(*) AS n_shared
    FROM tr JOIN te USING (s)
    GROUP BY train_doc, test_doc
    HAVING COUNT(*) >= {_MIN_SHARED}
"""


@query(
    "d09_decontamination",
    oracle=_D09_ORACLE,
    tags=("llm", "dedup", "contamination"),
)
def d09_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination sweep: flag (train_doc, test_doc) pairs
    sharing ≥ ``_MIN_SHARED`` distinct word-3-grams, where the split is
    the deterministic content-hash assignment t05 uses (bucket ≥ 90 ⇒
    held-out).

    Scale posture: the join is an inverted-index equi-join keyed by the
    shingle — the same shape as d02 — but with the decontamination-specific
    guard that makes it survive 100 TB: shingles whose document frequency
    exceeds ``_MAX_DF`` are dropped BEFORE the join (stop-shingle
    filtering). Hub shingles are exactly the ones that create quadratic
    join fan-out, and they carry no contamination signal; with them gone,
    join cost tracks rare-shingle collisions ≈ true overlaps. The test
    side is ~10% of the corpus and only (id, shingle-hash) pairs shuffle —
    never document text.
    """
    t = register(spark, sf_dir, ("documents",))
    bucket = fingerprint("text") % 100
    sh = (
        t["documents"]
        .select("doc_id", bucket.alias("__b"), F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    )
    # NOTE (r4): the plan shows the explode 4x (stop-shingle agg + both
    # split arms; ReuseExchange can't dedupe them). A localCheckpoint of
    # the exploded pairs was tried and REGRESSED 25x (4s -> 106s at
    # sf0.1): the checkpoint's stat-less lineage demotes every downstream
    # join off the broadcast path, which costs far more than the repeated
    # scan+explode the fused codegen pipelines execute at scan speed.
    # The d13 bloom path is the scale answer for this operator family.
    keep = sh.groupBy("s").agg(F.count_distinct("doc_id").alias("__df")).filter(
        F.col("__df") <= _MAX_DF
    )
    sh = sh.join(keep.select("s"), "s")
    train = sh.filter(F.col("__b") < 90).select(F.col("doc_id").alias("train_doc"), "s")
    test = sh.filter(F.col("__b") >= 90).select(F.col("doc_id").alias("test_doc"), "s")
    return (
        train.join(test, "s")
        .groupBy("train_doc", "test_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


_T07_RATES = {"en": 20, "fr": 40, "de": 60, "es": 80, "zh": 100}


def _sql_rate_case() -> str:
    clauses = " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in _T07_RATES.items())
    return f"CASE lang {clauses} ELSE 0 END"


@query(
    "t07_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({sql_fingerprint("text")}) % 100 < {_sql_rate_case()}
    """,
    tags=("llm", "sampling"),
)
def t07_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each language keeps a configured
    fraction of documents, selected by content hash — reproducible across
    runs/partitionings/engines, unlike ``DataFrame.sample`` (seeded
    per-partition, so a repartition changes the sample).

    Scale: a pure map-stage filter (no shuffle, no state); the rate table
    is a literal CASE. Rebalancing strata later only ever grows/shrinks
    each stratum monotonically (hash < rate), so raising a rate is an
    incremental top-up, not a resample — the property that matters when
    the sampled corpus feeds an expensive downstream pipeline.
    """
    t = register(spark, sf_dir, ("documents",))
    rate = None
    for lang, r in _T07_RATES.items():
        rate = F.when(F.col("lang") == lang, r) if rate is None else rate.when(
            F.col("lang") == lang, r
        )
    rate = rate.otherwise(0)
    return t["documents"].filter(fingerprint("text") % 100 < rate).select("doc_id", "lang")


@query(
    "s08_embedding_pca_whiten",
    oracle=None,  # float GEMM — accumulation-order-dependent; properties
    # (variance concentration, whitened covariance ≈ I, reconstruction
    # error, repartition-invariance) are pinned in tests/test_llm_ops.py
    tags=("llm", "embedding", "projection"),
)
def s08_embedding_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened 8-component projection of the embedding table — the
    decorrelation step before similarity search / clustering. The model
    (mean + axes + eigenvalues) is fitted driver-side on a bounded
    deterministic sample and closure-broadcast; the projection is one
    Arrow-batched GEMM per batch, shuffle-free. Output exploded to scalar
    (vec_id, comp, value) rows like s04/s05.
    """
    from dibimbing_case_study_etl_spark.operators.similarity import pca_fit, pca_project

    t = register(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    mean, comps, evs = pca_fit(emb, n_components=8)
    proj = pca_project(emb, mean, comps, evs, whiten=True)
    return proj.select("vec_id", F.posexplode("pca").alias("comp", "value"))


_T08_THRESHOLD = 0.2  # flag docs whose repeated-bigram mass exceeds this


@query(
    "t08_repetition_score",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS words
      FROM documents
    ),
    g AS (
      SELECT doc_id, words,
             list_transform(generate_series(1, greatest(len(words) - 1, 0)),
                            i -> words[i] || ' ' || words[i+1]) AS grams
      FROM w
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           {sql_iround(
               "1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE)", 6
           )} AS dup_word_ratio,
           {sql_iround(
               "CASE WHEN len(grams) = 0 THEN 0.0 "
               "ELSE 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE) END", 6
           )} AS dup_bigram_ratio,
           (CASE WHEN len(grams) = 0 THEN 0.0
                 ELSE 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE) END)
             > {_T08_THRESHOLD} AS is_repetitive
    FROM g
    """,
    tags=("llm", "text", "quality"),
)
def t08_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring — the C4/RefinedWeb-style filter
    that drops boilerplate and degenerate generations before training:
    fraction of duplicate words and duplicate word-bigrams per document,
    plus the flag at the configured threshold.

    Scale: a pure map stage over each document's own token array (split,
    distinct, two divisions) — no shuffle, no state, scan-speed at 100 TB.
    Ratios round through the rint/round_even helpers so the flag boundary
    is engine-independent.
    """
    t = register(spark, sf_dir, ("documents",))

    # Bind the split ONCE (the `_with_tokens` discipline): referencing
    # `tokens(text)` from n/grams/array_distinct would textually inline the
    # regex split into every copy — a pure-map stage that re-splits each
    # document several times per row.
    def build(w):
        n = F.size(w)
        ng = n - 1
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(ng, F.lit(0))),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        )
        return F.struct(
            n.alias("n"),
            F.size(F.array_distinct(w)).alias("nw_d"),
            F.when(ng <= 0, F.lit(0)).otherwise(F.size(F.array_distinct(grams))).alias("ng_d"),
            F.greatest(ng, F.lit(0)).alias("ng"),
        )

    st = F.element_at(F.transform(F.array(tokens(F.col("text"))), build), 1)
    stats = t["documents"].select("doc_id", st.alias("st"))
    n = F.col("st.n")
    dup_word = 1.0 - F.col("st.nw_d") / n.cast("double")
    dup_bigram = F.when(F.col("st.ng") <= 0, F.lit(0.0)).otherwise(
        1.0 - F.col("st.ng_d") / F.col("st.ng").cast("double")
    )
    return stats.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        iround(dup_word, 6).alias("dup_word_ratio"),
        iround(dup_bigram, 6).alias("dup_bigram_ratio"),
        (dup_bigram > _T08_THRESHOLD).alias("is_repetitive"),
    )


@query(
    "d10_containment_pairs",
    oracle="""
    WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM tok
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common / least(sa.n, sb.n) AS containment
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / least(sa.n, sb.n) >= 0.9
    """,
    tags=("llm", "dedup"),
)
def d10_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate pairs: word-3-gram overlap coefficient
    |A∩B| / min(|A|, |B|) ≥ 0.9 — the companion filter to d02 that
    catches a short document embedded verbatim inside a longer one
    (boilerplate wrappers, truncated copies), where Jaccard stays low
    because the union is dominated by the longer side.

    The ratio n_common / min(na, nb) is an exact small-integer division —
    IEEE-identical in both engines, no rounding needed at the threshold.
    """
    from dibimbing_case_study_etl_spark.operators.dedup import containment_pairs

    t = register(spark, sf_dir, ("documents",))
    return containment_pairs(t["documents"], "doc_id", "text", k=3, threshold=0.9)


@query(
    "t09_source_data_card",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             len(regexp_split_to_array(trim(text), ' +')) AS n_tokens
      FROM documents
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           {sql_iround("SUM(n_chars) / CAST(COUNT(*) AS DOUBLE)", 2)} AS avg_chars,
           quantile_cont(n_tokens, 0.5) AS median_tokens,
           quantile_cont(n_tokens, 0.95) AS p95_tokens
    FROM d
    GROUP BY source, lang
    """,
    tags=("llm", "text", "profiling"),
)
def t09_source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) corpus data card — the per-slice profile
    (doc counts, token mass, length distribution) every training-data
    curation run publishes before mixing sources.

    Scale: one shuffle keyed by the (source, lang) slice; token counts are
    computed map-side so only small per-group state moves. Exact
    interpolated percentiles match DuckDB's quantile_cont (integer inputs
    → exact rational interpolation, engine-independent); avg goes through
    the exact-integer-ratio form.
    """
    from dibimbing_case_study_etl_spark.functions.text import token_count

    t = register(spark, sf_dir, ("documents",))
    n_tok = token_count(F.col("text"))
    return (
        t["documents"]
        .select("source", "lang", "n_chars", n_tok.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            iround(F.sum("n_chars") / F.count(F.lit(1)).cast("double"), 2).alias("avg_chars"),
            F.percentile("n_tokens", 0.5).alias("median_tokens"),
            F.percentile("n_tokens", 0.95).alias("p95_tokens"),
        )
    )


@query(
    "t10_unigram_surprisal",
    oracle=f"""
    WITH wds AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS w
      FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS cnt FROM wds GROUP BY w),
    tot AS (SELECT SUM(cnt) AS tot FROM freq)
    SELECT doc_id, COUNT(*) AS n_words,
           {sql_iround(f"{sql_dsum('ln(tot) - ln(cnt)', 6)} / COUNT(*)", 4)}
             AS avg_surprisal
    FROM wds JOIN freq USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def t10_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: corpus word frequencies define a unigram
    model; each document scores its mean surprisal -ln p(w) = ln(total) -
    ln(count(w)). The KenLM-style perplexity filter's structure with the
    simplest possible model — low scores flag degenerate/boilerplate text,
    high scores flag gibberish.

    Scale: two shuffles (vocab count, then word→freq join keyed by the
    word). The vocabulary is sublinear in corpus size (Heaps' law) so the
    freq side stays broadcastable far beyond bench SF — but it is NOT
    hinted; AQE decides. Per-word surprisals round to 6 dp before the
    scaled-integer sum so accumulation order cannot flip the hash; ln()
    runs on bit-identical doubles (exact integer counts) in both engines.
    """
    t = register(spark, sf_dir, ("documents",))
    words = t["documents"].select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    # materialize the model: freq feeds the total AND the per-word join —
    # without this each consumer re-explodes the corpus (ReuseExchange
    # cannot dedupe them; r4 plan audit). The checkpoint is
    # vocabulary-sized (Heaps-sublinear), never corpus-sized.
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    total = freq.agg(F.sum("cnt").alias("tot"))
    surprisal = F.log(F.col("tot").cast("double")) - F.log(F.col("cnt").cast("double"))
    return (
        words.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            iround(dsum(surprisal, 6) / F.count(F.lit(1)), 4).alias("avg_surprisal"),
        )
    )


@query(
    "t11_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {sql_fingerprint('text')} AS fp,
             len(regexp_split_to_array(trim(text), ' +')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n,
             SUM(n) OVER (ORDER BY fp, doc_id ROWS UNBOUNDED PRECEDING) AS cum_end
      FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST((cum_end - n) // 512 AS BIGINT) AS first_seq,
           CAST((cum_end - 1) // 512 AS BIGINT) AS last_seq,
           CAST((cum_end - 1) // 512 - (cum_end - n) // 512 + 1 AS BIGINT) AS n_seqs
    FROM c
    """,
    tags=("llm", "packing", "prefix-sum"),
)
def t11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: documents concatenate in
    fingerprint order (a deterministic, reproducible corpus shuffle) and
    cut every 512 tokens; each document reports the training sequences it
    occupies.

    Scale: the global running token count is a DISTRIBUTED prefix sum
    (range shuffle → per-partition cumsum → driver-side offsets, one long
    per partition → map-stage add) — `operators/packing.py` — not a
    single-partition window, which is what the equivalent SQL window
    would execute as and the one thing that cannot run at 100 TB.
    """
    from dibimbing_case_study_etl_spark.operators.packing import pack_sequences

    t = register(spark, sf_dir, ("documents",))
    return pack_sequences(t["documents"], "doc_id", "text", seq_len=512)


_T12_ALPHA_SQRT = True  # mixture temperature α = 0.5 (sqrt sampling)
_T12_BUDGET = 1_000_000  # token budget the mixture is scaled to


@query(
    "t12_mixture_weights",
    oracle=f"""
    WITH s AS (
      SELECT source,
             SUM(len(regexp_split_to_array(trim(text), ' +'))) AS toks
      FROM documents
      GROUP BY source
    ),
    w AS (
      SELECT source, toks,
             {sql_iround("sqrt(toks / (SELECT CAST(SUM(toks) AS DOUBLE) FROM s))", 6)}
               AS w_raw
      FROM s
    )
    SELECT source,
           CAST(toks AS BIGINT) AS n_tokens,
           {sql_iround("w_raw / (SELECT SUM(w_raw) FROM w)", 6)} AS weight,
           CAST(round_even(w_raw / (SELECT SUM(w_raw) FROM w) * {_T12_BUDGET}, 0)
                AS BIGINT) AS budget_tokens
    FROM w
    """,
    tags=("llm", "mixing"),
)
def t12_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights (α = 0.5): each source's
    sampling weight ∝ sqrt of its token share — the standard upweighting
    of small high-quality sources when composing a pretraining mixture —
    plus each source's share of a fixed token budget.

    Scale: one shuffle keyed by source with map-side partial sums; the
    per-source table is tiny by construction. sqrt is IEEE
    correctly-rounded in both engines and runs on exact-integer ratios;
    raw weights round to 6 dp before the (small, exact) normalizing sum so
    no accumulation-order effect survives.
    """
    from dibimbing_case_study_etl_spark.functions.text import token_count

    t = register(spark, sf_dir, ("documents",))
    s = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("toks"))
    )
    total = s.agg(F.sum("toks").alias("tot"))
    w = s.crossJoin(F.broadcast(total)).select(
        "source",
        "toks",
        iround(F.sqrt(F.col("toks") / F.col("tot").cast("double")), 6).alias("w_raw"),
    )
    denom = w.agg(F.sum("w_raw").alias("den"))
    return w.crossJoin(F.broadcast(denom)).select(
        "source",
        F.col("toks").cast("bigint").alias("n_tokens"),
        iround(F.col("w_raw") / F.col("den"), 6).alias("weight"),
        F.call_function("rint", F.col("w_raw") / F.col("den") * _T12_BUDGET)
        .cast("bigint")
        .alias("budget_tokens"),
    )


@query(
    "d11_semdedup_pairs",
    oracle=None,  # the Lloyd-fitted cluster assignment has no SQL twin —
    # rows-only driver check; precision-exactness and recall (1.0 vs the
    # exact d05 baseline at sf0.001, and 500/500 on constructed
    # near-identical clones) are pinned in tests/test_llm_ops.py
    tags=("llm", "dedup", "embedding", "clustering"),
)
def d11_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-duplicate pairs via cluster-then-compare —
    embeddings land in their ``nprobe`` nearest IVF cells and only
    in-cell pairs are scored (exact JVM cosine, so every returned pair is
    a true near-dup; only recall is approximate). The embedding-space
    scale path that replaces d05's all-pairs O(n²) with O(Σ cell²).
    """
    from dibimbing_case_study_etl_spark.operators.similarity import semdedup_pairs

    t = register(spark, sf_dir, ("embeddings",))
    return semdedup_pairs(t["embeddings"], threshold=0.45, ncells=16, nprobe=4)
