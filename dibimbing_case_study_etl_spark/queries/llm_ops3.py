"""Third LLM-data-pipeline batch — corpus-hygiene operators every
large-scale training pipeline runs before the tokenizer sees a byte:

- t13: PII detection + redaction (email / IPv4 / phone) — counts and a
  scrubbed text length per document. Pure JVM regex (``regexp_count`` /
  ``regexp_replace``), zero Python, scan-speed at 100 TB.
- t14: corpus-level n-gram top-k — the frequency table that feeds
  tokenizer training and repetition diagnostics. Non-distinct bigrams,
  partial-agg combine, TakeOrderedAndProject top-k.
- d12: cross-document duplicated-shingle fraction — per-document share of
  its distinct word trigrams that occur in at least one other document
  (the Gopher/RefinedWeb "dup n-gram" quality signal; complements t08's
  *within*-document repetition score).

All three are exact-oracled: the DuckDB twins build the same token/shingle
arrays with ``string_split`` + ``list_transform`` (conventions of
``functions/text.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.windows import global_bounded as _gw
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.queries.llm_ops2 import _D09_ORACLE, _MAX_DF, _MIN_SHARED
from dibimbing_case_study_etl_spark.functions.text import (
    pii_count,
    redact_pii,
    sql_pii_count,
    sql_redact_pii,
    tokens,
    word_ngrams,
    word_shingles,
)
from dibimbing_case_study_etl_spark.queries import query


@query(
    "t13_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           {sql_pii_count("text", "email")} AS n_emails,
           {sql_pii_count("text", "ipv4")} AS n_ipv4,
           {sql_pii_count("text", "phone")} AS n_phones,
           CAST(length({sql_redact_pii("text")}) AS BIGINT) AS redacted_len,
           CAST(length(text) AS BIGINT) AS original_len
    FROM documents
    """,
    tags=("llm", "text", "pii"),
    bench=True,
)
def t13_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: per-document match counts for each pattern class and
    the post-redaction length (the audit columns a compliance review asks
    for). The synthetic corpus contains no PII — every count is zero here,
    which the oracle verifies exactly; the *semantics* on PII-bearing text
    are pinned in ``tests/test_text_functions.py`` on crafted rows through
    the same :func:`~..functions.text.redact_pii` helpers.

    Scale: stateless per-row regex in whole-stage codegen — a pure map
    stage, no shuffle, scan-bound at 100 TB.
    """
    t = register(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        pii_count(F.col("text"), "email").alias("n_emails"),
        pii_count(F.col("text"), "ipv4").alias("n_ipv4"),
        pii_count(F.col("text"), "phone").alias("n_phones"),
        F.length(redact_pii(F.col("text"))).cast("bigint").alias("redacted_len"),
        F.length("text").cast("bigint").alias("original_len"),
    )


_TOPK = 20


@query(
    "t14_ngram_topk",
    oracle=f"""
    WITH tok AS (
      SELECT regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    grams AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i+1])) AS gram
      FROM tok
    )
    SELECT gram, COUNT(*) AS n
    FROM grams
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT {_TOPK}
    """,
    tags=("llm", "text", "ngram", "topk"),
    bench=True,
)
def t14_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency top-k (tokenizer-training / repetition
    diagnostics input). Bigrams are NON-distinct — frequency is the point
    — unlike the deduplication shingles.

    Scale: explode → partial count map-side (the gram key space is much
    smaller than the corpus, so combiners crush the shuffle) → one shuffle
    on gram → TakeOrderedAndProject keeps only k rows per partition.
    Deterministic tiebreak on the gram string.
    """
    t = register(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .select(F.explode(word_ngrams(F.col("text"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(_TOPK)
    )


_SHINGLE_K = 3


@query(
    "d12_dup_ngram_fraction",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - {_SHINGLE_K - 1}, 0)),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents)
    ),
    df AS (SELECT s, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY s)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(CASE WHEN n_docs >= 2 THEN 1 END) AS n_dup,
           {sql_iround("COUNT(CASE WHEN n_docs >= 2 THEN 1 END) / CAST(COUNT(*) AS DOUBLE)", 6)}
             AS dup_frac
    FROM sh JOIN df USING (s)
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "quality"),
    bench=True,
)
def d12_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-shingle fraction: the share of a document's
    distinct word trigrams that appear in ≥1 *other* document — the
    cross-document repetition signal (Gopher-style dup-ngram filters) that
    catches boilerplate, templates, and mirror pages that exact dedup
    misses. Within-document repetition is t08; this is its corpus twin.

    Scale (every step skew-safe — boilerplate shingles are GUARANTEED at
    100 TB and pile millions of rows on single keys):

    1. the corpus is scanned, tokenized, and exploded to distinct
       ``(doc_id, s)`` pairs exactly ONCE, then materialized with
       ``localCheckpoint`` — tokenize+explode is the CPU-expensive step
       and both downstream consumers read the materialized pairs instead
       of re-scanning (r3 shipped a two-explode shape whose exchange reuse
       was never guaranteed: the aggregate arm's exchange child carries a
       partial-agg, the join arm's doesn't, so ReuseExchange can't fire);
    2. document frequency by ``groupBy(s)`` — partial aggregation combines
       map-side, so a hot shingle costs one partial row per input
       partition, never a hot reducer; only a boolean ``df >= 2`` flag is
       carried forward;
    3. INNER join pairs⋈flags on ``s`` — the flag side is unique-per-key,
       so AQE's skew-join split can cut a hot shingle's partition freely
       (it cannot split a skewed WINDOW partition, which is why
       ``count() over (partition by s)`` — one shuffle cheaper — is the
       wrong shape here);
    4. one aggregation by doc_id (well-distributed key) yields BOTH
       ``n_shingles`` (row count) and ``n_dup`` (flag sum) — no
       third-scan ``size()`` pass, no join-back.

    No pairwise comparison anywhere: cost is O(total shingles), not
    O(docs²). The checkpoint trades one write+read of the pair set
    (comparable to the s-shuffle it feeds anyway) for the second
    scan+tokenize of the corpus.
    """
    t = register(spark, sf_dir, ("documents",))
    sh = t["documents"].select(
        "doc_id", F.explode(word_shingles(F.col("text"), _SHINGLE_K)).alias("s")
    )
    sh = sh.localCheckpoint(eager=True)
    flags = sh.groupBy("s").agg((F.count(F.lit(1)) >= 2).alias("dup"))
    return (
        sh.join(flags, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("dup").cast("bigint")).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            iround(F.col("n_dup") / F.col("n_shingles").cast("double"), 6).alias("dup_frac"),
        )
    )


@query(
    "d13_bloom_decontamination",
    # bloom has no false negatives and candidates are exact-verified, so
    # the output is IDENTICAL to d09's — they share the oracle (the same
    # candidates-then-verify contract d03 uses to share d02's oracle).
    oracle=_D09_ORACLE,
    tags=("llm", "dedup", "contamination", "bloom"),
)
def d13_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination, bloom-prefilter scale path (exact
    output parity with d09, pinned by the shared oracle and
    ``test_llm_ops.py``).

    d09's shape shuffles BOTH sides of the inverted-index join by shingle.
    At 100 TB the train side dominates that shuffle, yet almost none of it
    matters: only shingles that occur in the (contract-small) held-out set
    can contaminate. So: collect the kept test-side shingle hashes
    (``_collect_small`` contract — raises past 64k rows rather than
    OOMing), pack them into a ~1%-FPR broadcast bloom, and drop train
    shingle rows in a pure MAP stage before any shuffle. The exact join
    then runs over survivors only (true overlaps + ~1% noise), and bloom
    false positives die in that join. One full-corpus shuffle (the
    stop-shingle document-frequency pass, shared with d09) remains — it is
    partial-agg and skew-free.
    """
    from dibimbing_case_study_etl_spark.functions.text import fingerprint
    from dibimbing_case_study_etl_spark.operators.bloom import bloom_prefilter, build_bloom
    from dibimbing_case_study_etl_spark.operators.similarity import _collect_small

    t = register(spark, sf_dir, ("documents",))
    bucket = fingerprint("text") % 100
    sh = t["documents"].select(
        "doc_id", bucket.alias("__b"), F.explode(word_shingles(F.col("text"), 3)).alias("s")
    )
    keep = (
        sh.groupBy("s").agg(F.count_distinct("doc_id").alias("__df"))
        .filter(F.col("__df") <= _MAX_DF)
    )
    sh = sh.join(keep.select("s"), "s")
    test = sh.filter(F.col("__b") >= 90).select(F.col("doc_id").alias("test_doc"), "s")
    train = sh.filter(F.col("__b") < 90).select(F.col("doc_id").alias("train_doc"), "s")

    test_hashes = [
        r.h for r in _collect_small(
            test.select(F.xxhash64("s").alias("h")).distinct(), "held-out shingle set"
        )
    ]
    bloom = build_bloom(test_hashes)
    candidates = bloom_prefilter(
        train.withColumn("h", F.xxhash64("s")), "h", bloom
    ).drop("h")
    return (
        candidates.join(test, "s")
        .groupBy("train_doc", "test_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


_M06_HAMMING = 11  # sf0.01 min pairwise distance is 9 — ≤3 was vacuous at the gate SF

_M06_ORACLE = f"""
    WITH cp AS (
      SELECT doc_id,
             list_transform(generate_series(1, length(text)),
                            i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS w
      FROM documents WHERE length(text) >= 64
    ),
    st AS (SELECT doc_id, w, len(w) AS L, list_sum(w) AS S FROM cp),
    bits AS (
      SELECT doc_id,
             list_transform(generate_series(0, 63), j ->
               CASE WHEN list_sum(list_slice(w, (j*L)//64 + 1, ((j+1)*L)//64)) * L
                         >= S * (((j+1)*L)//64 - (j*L)//64)
                    THEN 1 ELSE 0 END) AS b
      FROM st
    ),
    h AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 31),
                                          j -> CAST(b[j+1] AS BIGINT) << j)) AS BIGINT) AS h1,
             CAST(list_sum(list_transform(generate_series(0, 31),
                                          j -> CAST(b[j+33] AS BIGINT) << j)) AS BIGINT) AS h2
      FROM bits
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= {_M06_HAMMING}
"""


@query(
    "m06_phash_neardup",
    oracle=_M06_ORACLE,
    tags=("llm", "multimodal", "dedup"),
)
def m06_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over multimodal content — the
    image twin of SimHash (d04): 64-bit aHash (chunk mean vs global mean,
    EXACT integer arithmetic) + pigeonhole band join, Hamming ≤ 11 via
    16×4-bit bands (the loose diagnostic setting — synthetic driver docs
    have no pairs under the production ≤3 threshold, which made the r3
    driver row vacuous; the operator default remains 4×16/≤3).

    The grayscale stand-in is the codepoint sequence (the same
    bytes≡codepoints equivalence m01's oracle uses on the ASCII corpus); a
    real deployment decodes pixels in the Arrow path and reuses the same
    chunk-mean + band-join machinery. Because the hash is pure integer
    arithmetic — no xxhash — the ENTIRE operator is exact-oracled, where
    d04's signature cannot be (DuckDB has no xxhash64 twin); the oracle is
    the O(n²) definition, the engine the pigeonhole band join.

    Scale: candidates come from equi-joins keyed by 16-bit band values,
    never an n² cross join; the signature table materializes once
    (persist) for the four-band self-join; verification is one
    XOR+bit_count per candidate.
    """
    from dibimbing_case_study_etl_spark.operators.multimodal import phash_neardup_pairs

    t = register(spark, sf_dir, ("documents",))
    return phash_neardup_pairs(
        t["documents"], "doc_id", "text", max_hamming=_M06_HAMMING, n_bands=16
    )


_VOCAB_SIZE = 256  # ids 1..255; 0 = UNK


@query(
    "t15_tokenize_ids",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), ' +') AS w
      FROM documents
    ),
    flat AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS pos,
             w[i] AS term
      FROM tok, LATERAL (SELECT UNNEST(generate_series(1, len(w))) AS i)
      WHERE w[i] <> ''
    ),
    vocab AS (
      SELECT term,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS id
      FROM (SELECT term, COUNT(*) AS n FROM flat GROUP BY term
            ORDER BY n DESC, term LIMIT {_VOCAB_SIZE - 1})
    )
    SELECT f.doc_id, f.pos, COALESCE(v.id, 0) AS token_id
    FROM flat f LEFT JOIN vocab v USING (term)
    """,
    tags=("llm", "text", "tokenize"),
)
def t15_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-id encoding — the step between t06 (vocab construction)
    and t11 (sequence packing): every token becomes an integer id from the
    frequency-ranked top-``{V-1}`` vocabulary, everything else the UNK id 0.
    Output is exploded ``(doc_id, pos, token_id)`` scalar rows (driver
    canonicalizer contract; downstream packing re-assembles by pos).

    Scale: the vocab is a BOUNDED model table (256 rows) built with the
    same partial-agg top-k shape as t06 — the rank window runs over 255
    rows, not the corpus — and joins back as a broadcast hash lookup, so
    the encode pass is scan-speed with no corpus-sized shuffle: one
    explode, one broadcast join. Ties rank deterministically
    (count desc, term) in both engines.
    """
    t = register(spark, sf_dir, ("documents",))
    toks = t["documents"].select(
        "doc_id", F.posexplode(tokens(F.lower(F.col("text")))).alias("pos0", "term")
    ).filter(F.col("term") != "").select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "term"
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(_VOCAB_SIZE - 1)
        .select(
            "term",
            F.row_number()
            .over(_gw().orderBy(F.desc("n"), F.asc("term")))
            .cast("bigint")
            .alias("id"),
        )
    )
    return toks.join(F.broadcast(vocab), "term", "left").select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(0).cast("bigint")).alias("token_id")
    )


@query(
    "s09_knn_graph",
    oracle=None,  # BLAS accumulation reorder (same class as s03) — exact
    # rank agreement vs the JVM cosine_topk baseline pinned in tests
    tags=("llm", "similarity", "graph"),
)
def s09_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine k-NN graph over the whole embeddings corpus — the
    input structure for graph-based embedding dedup and clustering
    (SemDeDup-style pipelines consume exactly this).

    Scale: block-pair GEMM (``operators/similarity.knn_graph``) — vectors
    hash into packed block matrices, every block pair is one
    embarrassingly-parallel numpy matmul emitting its local top-k, and a
    final per-vector window keeps the global top-k. Shuffled volume is
    O(N·k·blocks), never O(N²) rows; nothing is broadcast or collected,
    unlike s01/s03 whose query side is contract-bounded. Values carry
    BLAS accumulation order (not bitwise-JVM), so the driver check is
    rows-only; rank agreement vs the exact JVM baseline is pinned in
    ``tests/test_llm_ops.py``.
    """
    from dibimbing_case_study_etl_spark.operators.similarity import knn_graph

    t = register(spark, sf_dir, ("embeddings",))
    return knn_graph(t["embeddings"].select("vec_id", "embedding"), k=5)


@query(
    "m07_png_decode_features",
    # Full codec oracle: the synth pixels are the document's bytes tiled to
    # a doc_id-derived geometry, so DuckDB reproduces width/height/px_sum/
    # px_mean WITHOUT decoding — any disagreement means the PNG
    # encode→zlib→unfilter→decode round trip corrupted a pixel. ASCII
    # corpus ⇒ codepoint == byte (same equivalence m01's oracle uses);
    # empty documents become a single zero pixel.
    oracle=f"""
    WITH geom AS (
      SELECT doc_id, text,
             8 + doc_id % 9       AS width,
             8 + (doc_id * 3) % 9 AS height,
             (8 + doc_id % 9) * (8 + (doc_id * 3) % 9) AS n
      FROM documents
    ),
    px AS (
      SELECT doc_id, width, height, n,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE list_sum(list_transform(generate_series(1, CAST(n AS BIGINT)),
                         i -> unicode(substr(text, CAST((i - 1) % length(text) AS INT) + 1, 1))))
             END AS px_sum
      FROM geom
    )
    SELECT doc_id,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS channels,
           CAST(px_sum AS BIGINT) AS px_sum,
           {sql_iround("px_sum / CAST(n AS DOUBLE)", 6)} AS px_mean
    FROM px
    """,
    tags=("llm", "multimodal", "decode"),
)
def m07_png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (closes the r1–r3 decode stub): each
    document renders to a spec-valid greyscale PNG (zlib-compressed by the
    dependency-free encoder), then :func:`decode_image_features` decodes
    the bytes back — Pillow when installed, else the built-in subset PNG
    decoder — and emits geometry + pixel statistics. Both hops are
    Arrow-batched ``mapInPandas`` stages, partition-spread before the
    Python work like every expensive hop.

    Scale: encode and decode are embarrassingly parallel per-row Python
    stages (the deployment posture for codec work on a cluster); nothing
    shuffles except the initial spread, and the oracle pins the codec
    bit-exactly at every SF.
    """
    from dibimbing_case_study_etl_spark.operators.multimodal import (
        decode_image_features,
        synth_png_table,
    )

    t = register(spark, sf_dir, ("documents",))
    pngs = synth_png_table(t["documents"], "doc_id", "text")
    feats = decode_image_features(pngs, spread=False)  # synth_png_table already spread
    return feats.select(
        "doc_id",
        "width",
        "height",
        "channels",
        "px_sum",
        iround(F.col("px_mean"), 6).alias("px_mean"),
    )
