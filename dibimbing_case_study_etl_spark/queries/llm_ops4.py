"""Fourth LLM-data-pipeline batch — the steps between a cleaned corpus and
a training shard:

- t16: overlapping document chunking — the fixed-window split every
  context-bounded trainer/embedder runs. Pure array math per row
  (sequence → slice → explode), no Python, no shuffle.
- t17: per-document TF-IDF top terms — the classic relevance signal for
  corpus exploration and keyword extraction; one token explode feeds both
  the term-frequency and document-frequency aggregates.
- d14: incremental (cross-snapshot) dedup — classify an INCOMING batch of
  documents against the EXISTING corpus (exact content hash, then
  near-dup Jaccard), never comparing incoming docs to each other: the
  shape of a daily ingest dedup at 100 TB, where the corpus side is the
  big one and the incoming batch is the small one.
- s10: per-vector symmetric int8 embedding quantization with
  reconstruction-error audit — the storage-shrink pass (4× over float32)
  run before embeddings are shipped to an ANN serving tier (s02/s06/s07).

All four are exact-oracled in DuckDB (list_transform/list_slice twins of
the Spark higher-order functions; md5 is identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dibimbing_case_study_etl_spark.catalog import register
from dibimbing_case_study_etl_spark.functions.oracle_safe import iround, sql_iround
from dibimbing_case_study_etl_spark.functions.text import tokens, word_shingles
from dibimbing_case_study_etl_spark.queries import query

_CHUNK_WINDOW = 64  # words per chunk
_CHUNK_STRIDE = 48  # window minus overlap (overlap = 16 words)
_CHUNK_OVERLAP = _CHUNK_WINDOW - _CHUNK_STRIDE


@query(
    "t16_document_chunking",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
      FROM documents
    ),
    starts AS (
      SELECT doc_id, w, s
      FROM tok, unnest(generate_series(1, greatest(len(w), 1), {_CHUNK_STRIDE})) AS u(s)
      WHERE s = 1 OR s <= len(w) - {_CHUNK_OVERLAP}
    )
    SELECT doc_id,
           CAST((s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(w, s, s + {_CHUNK_WINDOW} - 1), ' ') AS chunk_text,
           CAST(least({_CHUNK_WINDOW}, len(w) - s + 1) AS BIGINT) AS n_words
    FROM starts
    """,
    tags=("llm", "text", "chunking"),
    bench=True,
)
def t16_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping fixed-size word windows
    (window {w}, stride {s}): chunk starts are 1, 1+stride, …; a start
    past ``len - overlap`` would produce a chunk fully contained in its
    predecessor and is dropped (every word is still covered exactly once
    by the preceding window). Documents shorter than one window yield a
    single chunk.

    Scale: per-row array arithmetic in whole-stage codegen — sequence →
    filter → explode → slice, zero shuffle, scan-bound. The explode
    multiplies rows ~len/stride ×, which is the DESIRED output
    cardinality, not an intermediate blow-up.
    """.format(w=_CHUNK_WINDOW, s=_CHUNK_STRIDE)
    t = register(spark, sf_dir, ("documents",))
    w = F.col("__w")
    n = F.size(w)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(_CHUNK_STRIDE)),
        lambda s: (s == 1) | (s <= n - _CHUNK_OVERLAP),
    )
    return (
        t["documents"]
        .select("doc_id", tokens(F.col("text")).alias("__w"))
        .select("doc_id", "__w", F.explode(starts).alias("__s"))
        .select(
            "doc_id",
            ((F.col("__s") - 1) / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.array_join(F.slice(w, F.col("__s"), _CHUNK_WINDOW), " ").alias("chunk_text"),
            F.least(F.lit(_CHUNK_WINDOW), n - F.col("__s") + 1).cast("bigint").alias("n_words"),
        )
    )


_TFIDF_TOPK = 3


@query(
    "t17_tfidf_top_terms",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS word
      FROM documents
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
    ),
    df AS (
      SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             {sql_iround("tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))", 4)} AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf
    FROM (
      SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rn
      FROM scored
    )
    WHERE rn <= {_TFIDF_TOPK}
    """,
    tags=("llm", "text", "tfidf", "topk"),
    bench=True,
)
def t17_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1)),
    score rounded to 4 dp BEFORE ranking so both engines rank the same
    values; ties broken on the term string).

    Scale: ONE token explode feeds both aggregates — tf is the (doc, word)
    count, materialized with ``localCheckpoint`` so the df aggregate reads
    the SAME rows instead of re-exploding the corpus (lineage reuse alone
    does not dedupe it: the two consumers' exchange children differ, so
    ReuseExchange cannot fire — the d12 lesson). df is then a partial-agg
    over tf's output (already distinct per doc, so no countDistinct
    shuffle). N arrives as a broadcast single-row cross join; the final
    per-doc top-k is a bounded rank window (WindowGroupLimit pushes k
    into the sort). The word key space is Zipf-skewed but both aggregates
    are partial-agg combines, which absorb skew map-side; the tf⋈df join
    keys on the word with unique-per-key build side, the shape AQE can
    skew-split.
    """.format(k=_TFIDF_TOPK)
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            iround(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
            ).alias("tfidf"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    )
    return scored.withColumn("rn", rn).filter(F.col("rn") <= _TFIDF_TOPK).drop("rn")


# incoming batch = docs whose id lands in the top 20% of the id hash space;
# the split must be deterministic and identical across engines, so it keys
# on doc_id arithmetic, not on a hash builtin.
_D14_INCOMING = "doc_id % 10 >= 8"
_D14_JACCARD = 0.5
_D14_K = 3


@query(
    "d14_incremental_dedup",
    oracle=f"""
    WITH existing AS (
      SELECT * FROM documents WHERE NOT ({_D14_INCOMING})
    ),
    incoming AS (
      SELECT * FROM documents WHERE {_D14_INCOMING}
    ),
    exact AS (
      SELECT i.doc_id, min(e.doc_id) AS dup_of
      FROM incoming i JOIN existing e ON md5(i.text) = md5(e.text)
      GROUP BY i.doc_id
    ),
    ish AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(trim(text), ' +')) - {_D14_K - 1}, 0)),
               idx -> array_to_string(list_slice(regexp_split_to_array(trim(text), ' +'), idx, idx + {_D14_K - 1}), ' ')
             ))) AS s
      FROM incoming
    ),
    esh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(trim(text), ' +')) - {_D14_K - 1}, 0)),
               idx -> array_to_string(list_slice(regexp_split_to_array(trim(text), ' +'), idx, idx + {_D14_K - 1}), ' ')
             ))) AS s
      FROM existing
    ),
    sizes_i AS (SELECT doc_id, COUNT(*) AS n FROM ish GROUP BY doc_id),
    sizes_e AS (SELECT doc_id, COUNT(*) AS n FROM esh GROUP BY doc_id),
    common AS (
      SELECT ish.doc_id AS di, esh.doc_id AS de, COUNT(*) AS c
      FROM ish JOIN esh USING (s)
      GROUP BY ish.doc_id, esh.doc_id
    ),
    near AS (
      SELECT di AS doc_id, min(de) AS dup_of
      FROM common
      JOIN sizes_i ON sizes_i.doc_id = common.di
      JOIN sizes_e ON sizes_e.doc_id = common.de
      WHERE CAST(c AS DOUBLE) / (sizes_i.n + sizes_e.n - c) >= {_D14_JACCARD}
      GROUP BY di
    )
    SELECT i.doc_id,
           COALESCE(exact.dup_of, near.dup_of) AS dup_of,
           CASE WHEN exact.doc_id IS NOT NULL THEN 'exact'
                WHEN near.doc_id IS NOT NULL THEN 'near'
                ELSE 'new' END AS verdict
    FROM incoming i
    LEFT JOIN exact ON exact.doc_id = i.doc_id
    LEFT JOIN near ON near.doc_id = i.doc_id
    """,
    tags=("llm", "dedup", "incremental"),
)
def d14_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify an incoming document batch against the existing corpus:
    ``exact`` (identical content hash), ``near`` (word-trigram Jaccard ≥
    {j} against some existing doc), or ``new``. ``dup_of`` reports the
    smallest matching existing doc id (exact match wins over near).

    This is the INCREMENTAL shape of d01/d02: incoming×incoming pairs are
    never formed — a daily ingest only needs to compare against the
    corpus, and the corpus side never self-joins. At 100 TB the exact arm
    is a hash join on a 32-byte digest (corpus side partial-agged to
    distinct digests before the join); the near arm is the d02 inverted
    shingle index with the incoming batch as the (much smaller) probe
    side. Both arms share the incoming scan.
    """.format(j=_D14_JACCARD)
    t = register(spark, sf_dir, ("documents",))
    docs = t["documents"]
    incoming_pred = F.expr(_D14_INCOMING)
    incoming = docs.filter(incoming_pred)
    existing = docs.filter(~incoming_pred)

    exact = (
        incoming.select("doc_id", F.md5("text").alias("__h"))
        .join(
            existing.select(F.col("doc_id").alias("__e"), F.md5("text").alias("__h")),
            "__h",
        )
        .groupBy("doc_id")
        .agg(F.min("__e").alias("__exact_of"))
    )

    def shingle_index(df: DataFrame, out_id: str) -> DataFrame:
        # materialized once per side (d12 precedent): each index feeds its
        # size aggregate AND the candidate join — unchecked, every consumer
        # re-tokenizes and re-explodes its side (4 Generate nodes in the
        # r4 plan audit)
        return df.select(
            F.col("doc_id").alias(out_id),
            F.explode(word_shingles(F.col("text"), _D14_K)).alias("__s"),
        ).localCheckpoint(eager=True)

    ish = shingle_index(incoming, "__di")
    esh = shingle_index(existing, "__de")
    sizes_i = ish.groupBy("__di").agg(F.count(F.lit(1)).alias("__ni"))
    sizes_e = esh.groupBy("__de").agg(F.count(F.lit(1)).alias("__ne"))
    common = ish.join(esh, "__s").groupBy("__di", "__de").agg(
        F.count(F.lit(1)).alias("__c")
    )
    near = (
        common.join(sizes_i, "__di")
        .join(sizes_e, "__de")
        .filter(
            F.col("__c") / (F.col("__ni") + F.col("__ne") - F.col("__c")) >= _D14_JACCARD
        )
        .groupBy("__di")
        .agg(F.min("__de").alias("__near_of"))
        .withColumnRenamed("__di", "doc_id")
    )

    return (
        incoming.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__exact_of", "__near_of").alias("dup_of"),
            F.when(F.col("__exact_of").isNotNull(), F.lit("exact"))
            .when(F.col("__near_of").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


@query(
    "s10_embedding_quantize_int8",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, e,
             list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
      FROM v
    ),
    err AS (
      SELECT vec_id, scale,
             CASE WHEN scale = 0 THEN 0.0
                  ELSE list_aggregate(
                    list_transform(e, x -> abs(x - round_even(x / scale, 0) * scale)),
                    'max')
             END AS max_err
      FROM scaled
    )
    SELECT vec_id,
           {sql_iround("scale", 6)} AS qscale,
           {sql_iround("max_err", 6)} AS max_abs_err
    FROM err
    """,
    tags=("llm", "embedding", "quantization"),
    bench=True,
)
def s10_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale =
    max|x|/127, codes = rint(x/scale) ∈ [-127, 127], and the max absolute
    reconstruction error |x − code·scale| per vector (the number a serving
    tier checks before swapping float32 out for int8 — 4× smaller
    vectors, which at 100 TB of embeddings is the difference between
    fitting the ANN tier in RAM or not).

    Scale: stateless per-row array arithmetic (higher-order functions in
    codegen), zero shuffle, scan-bound. The all-zero-vector edge case is
    explicit (scale 0 → error 0), not a NaN that poisons downstream
    aggregates. Cross-engine determinism: both sides compute in double
    with half-even rint; same IEEE operations in the same index order.
    """
    t = register(spark, sf_dir, ("embeddings",))
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = (
        F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("__scale")
    sc = F.col("__scale")
    recon_err = F.array_max(
        F.transform(
            F.col("__e"),
            lambda x: F.abs(x - F.call_function("rint", x / sc) * sc),
        )
    )
    return (
        t["embeddings"]
        .select("vec_id", e.alias("__e"), scale)
        .select(
            "vec_id",
            iround(sc, 6).alias("qscale"),
            iround(
                F.when(sc == 0, F.lit(0.0)).otherwise(recon_err), 6
            ).alias("max_abs_err"),
        )
    )


@query(
    "t18_bigram_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i+1])) AS gram
      FROM tok
    ),
    bgc AS (SELECT gram, COUNT(*) AS cnt FROM bg GROUP BY gram),
    pfx AS (
      SELECT split_part(gram, ' ', 1) AS w1, SUM(cnt) AS pcnt
      FROM bgc GROUP BY w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           {sql_iround(f"(SUM(CAST(round_even((ln(pcnt) - ln(cnt)) * 1000000, 0) AS BIGINT)) / 1000000.0) / COUNT(*)", 4)}
             AS avg_surprisal
    FROM bg
    JOIN bgc USING (gram)
    JOIN pfx ON pfx.w1 = split_part(bg.gram, ' ', 1)
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality", "ngram"),
)
def t18_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (t10's unigram model, one order higher):
    corpus bigram counts define P(w2|w1) = c(w1 w2)/c(w1 ·); each document
    scores its mean conditional surprisal ln c(w1 ·) − ln c(w1 w2).
    Documents shorter than two words have no bigrams and drop out (no
    model applies to them — t02/t10 cover degenerate-length filtering).

    Scale: the bigram vocabulary is the model — larger than t10's unigram
    vocab but still Heaps-sublinear in corpus size; both the bigram and
    the prefix-marginal tables are partial-agg combines, the per-doc join
    keys on the gram (Zipf-skewed, absorbed map-side by the combine; the
    join itself is AQE-decided, unhinted). Per-bigram surprisals round to
    6 dp before the scaled-integer sum — accumulation order cannot flip
    the hash; ln() runs on bit-identical integer-count doubles.
    """
    from dibimbing_case_study_etl_spark.functions.oracle_safe import dsum
    from dibimbing_case_study_etl_spark.functions.text import word_ngrams

    t = register(spark, sf_dir, ("documents",))
    bg = t["documents"].select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("gram")
    )
    # materialize the model: bgc feeds the prefix marginal AND the
    # per-occurrence join — without this each consumer re-explodes the
    # corpus (3 Generate nodes in the r4 plan audit). Model-sized
    # (bigram vocabulary), never corpus-sized.
    bgc = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=True)
    pfx = bgc.groupBy(
        F.substring_index("gram", " ", 1).alias("w1")
    ).agg(F.sum("cnt").alias("pcnt"))
    surprisal = F.log(F.col("pcnt").cast("double")) - F.log(F.col("cnt").cast("double"))
    return (
        bg.join(bgc, "gram")
        .join(pfx, F.substring_index(bg["gram"], " ", 1) == F.col("w1"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            iround(dsum(surprisal, 6) / F.count(F.lit(1)), 4).alias("avg_surprisal"),
        )
    )


_M08_HAMMING = 11  # mirrors m06's gate-SF-non-vacuous diagnostic setting


@query(
    "m08_png_phash_neardup",
    # Same full-pipeline oracle idea as m07: the synth PNG pixels are the
    # document's bytes tiled to a doc_id-derived geometry, so DuckDB
    # reproduces the decoded pixel list WITHOUT a codec, computes the same
    # integer-exact aHash, and joins the O(n²) definition. Any
    # disagreement means decode OR hash OR banding broke.
    oracle=f"""
    WITH geom AS (
      SELECT doc_id, text,
             8 + doc_id % 9       AS width,
             8 + (doc_id * 3) % 9 AS height
      FROM documents
    ),
    px AS (
      -- empty text renders as a FULL width×height zero image (synth_png_table
      -- tiles np.zeros(1)), so the oracle tiles the zero pixel to the same
      -- geometry — a 1-pixel stand-in would hash to a different bit pattern
      -- and flip near-dup membership for every empty document
      SELECT doc_id,
             list_transform(generate_series(1, CAST(width * height AS BIGINT)),
               i -> CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
                         ELSE CAST(unicode(substr(text, CAST((i - 1) % length(text) AS INT) + 1, 1)) AS BIGINT)
                    END) AS w
      FROM geom
    ),
    st AS (SELECT doc_id, w, len(w) AS L, list_sum(w) AS S FROM px),
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
    WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= {_M08_HAMMING}
    """,
    tags=("llm", "multimodal", "dedup", "decode"),
)
def m08_png_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over REAL image bytes: render each document
    to a spec-valid greyscale PNG (m07's fixture path), DECODE the blobs
    back (Pillow or the built-in codec), aHash the decoded pixels in the
    same Arrow stage, and find Hamming ≤ {h} pairs with the pigeonhole
    band join. m06 hashes a codepoint stand-in JVM-side; this is the
    deployment path — codec → pixels → hash — with the whole chain
    exact-oracled because the fixture pixels are reconstructible in SQL.

    Scale: decode+hash is one partition-spread Arrow pass (scan-bound);
    candidates come from 8-bit-band multiprobe equi-joins via the shared
    :func:`band_hamming_pairs` (radius-1 probes: the same ≤11 guarantee
    with ~12× more selective buckets than the 4-bit bands a plain
    16-band join would force — the decode hashes vary with the doc-id-
    derived geometry, so clone canonicalization alone cannot bound this
    path's buckets), never n²; only the 3-column signature table
    shuffles.
    """.format(h=_M08_HAMMING)
    from dibimbing_case_study_etl_spark.operators.multimodal import (
        band_hamming_pairs,
        decode_phash,
        synth_png_table,
    )

    t = register(spark, sf_dir, ("documents",))
    pngs = synth_png_table(t["documents"], "doc_id", "text")
    sig = decode_phash(pngs, spread=False)  # synth_png_table already spread
    return band_hamming_pairs(sig, max_hamming=_M08_HAMMING, n_bands=8, probe_bits=1)


@query(
    "s11_cosine_histogram",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    p AS (
      SELECT CAST(round_even(least(1.0, greatest(-1.0,
               list_cosine_similarity(a.e, b.e))) * 10000, 0) AS BIGINT) AS s4
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT CAST(floor(s4 / 500.0) AS BIGINT) * 500 / 10000.0 AS bucket_lo,
           COUNT(*) AS n_pairs
    FROM p
    -- floor division, NOT DuckDB's // (which truncates toward zero and
    -- would shift every negative bucket by one vs numpy's floor)
    GROUP BY CAST(floor(s4 / 500.0) AS BIGINT)
    ORDER BY bucket_lo
    """,
    tags=("llm", "similarity", "histogram"),
)
def s11_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-similarity distribution over ALL unordered embedding pairs
    (0.05-wide buckets) — the calibration curve every near-dup threshold
    (d05/d11) is read off: the clone mode, the background mass, the gap
    between them. The pair space is quadratic; the ANSWER is ~40 rows.

    Scale: block-pair GEMM bins similarities INSIDE each Arrow task —
    only (bucket, count) rows shuffle, pairs are never materialized.
    Bucketing is integer floor-division on 4-dp scaled sims, so no float
    boundary can flip a bucket between engines (the oracle is the O(n²)
    definition in DuckDB).
    """
    from dibimbing_case_study_etl_spark.operators.similarity import cosine_histogram

    t = register(spark, sf_dir, ("embeddings",))
    return cosine_histogram(t["embeddings"], "vec_id", "embedding")


_D15_SPAN = 64   # chars per anchored gram
_D15_ANCH = 8    # anchor window (chars hashed to decide an anchor)
_D15_MOD = 16    # 1-in-16 positions anchor → expected gap ~16 chars
_D15_MAX_DF = 8  # hub-gram guard: grams in more docs carry no pair signal





def _cdc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) pairs for :func:`d15_cdc_span_pairs` — vectorized
    anchor extraction in one Arrow pass. Semantics are EXACTLY the HOF
    formulation the oracle runs (polynomial (a*31+x) mod 2147483647 over
    the preceding window, anchor iff hash % mod == 0): the per-step mod
    equals one polynomial-sum mod because the int64 dot product cannot
    overflow (max codepoint 0x10FFFF x 31^7 x 8 < 2^63). The HOF version
    re-hashed every window from scratch in interpreted Catalyst lambdas —
    ~12x slower at sf0.1 for identical output."""
    import numpy as np
    import pandas as pd

    M = 2147483647
    powers = (31 ** np.arange(_D15_ANCH - 1, -1, -1, dtype=object)).astype(np.int64)

    def extract(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_id, out_g = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                if n < _D15_ANCH + _D15_SPAN:
                    continue
                cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                win = sliding_window_view(cp, _D15_ANCH)  # window w starts at 0-based w
                h = (win @ powers) % M
                # anchor at 1-based p = w + ANCH + 1, valid while p <= n - SPAN + 1
                ws = np.nonzero(h[: n - _D15_SPAN - _D15_ANCH + 1] % _D15_MOD == 0)[0]
                seen = set()
                for w in ws:
                    g = text[w + _D15_ANCH : w + _D15_ANCH + _D15_SPAN]
                    if g not in seen:
                        seen.add(g)
                        out_id.append(doc_id)
                        out_g.append(g)
            yield pd.DataFrame({"doc_id": out_id, "g": out_g})

    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    return spread.select("doc_id", "text").mapInPandas(
        extract, schema="doc_id long, g string"
    )


@query(
    "d15_cdc_span_pairs",
    oracle=f"""
    WITH anch AS (
      SELECT doc_id,
             list_filter(generate_series({_D15_ANCH + 1}, length(text) - {_D15_SPAN - 1}), p ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(p - {_D15_ANCH}, p - 1),
                                i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % 2147483647) % {_D15_MOD} = 0) AS ps
      FROM documents
      WHERE length(text) >= {_D15_ANCH + _D15_SPAN}
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(ps, p -> substr(text, CAST(p AS INT), {_D15_SPAN}))) AS g
      FROM anch JOIN documents USING (doc_id)
    ),
    keep AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= {_D15_MAX_DF}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_spans
    FROM grams a JOIN keep USING (g) JOIN grams b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    tags=("llm", "dedup", "cdc", "memorization"),
)
def d15_cdc_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-span duplication via content-defined chunking: documents
    sharing ≥1 anchored {span}-char substring, with the number of shared
    spans. Anchors are positions whose preceding {aw}-char rolling hash ≡0
    (mod {mod}) — the rsync/CDC trick that makes anchor placement a
    function of CONTENT, not offset, so a copied span anchors identically
    in both documents regardless of where it was pasted. This is the
    memorization-span detector (copied quotes, licence blocks, mirrored
    paragraphs) that token-level Jaccard (d02) dilutes away on long docs.

    Scale: anchor extraction is stateless per-row codegen (~1 gram per
    {mod} chars, so the index is ~len/{mod} entries per doc); the pair
    join is the d09-style inverted index with the same hub guard —
    grams in more than {mdf} docs (boilerplate) are dropped before the
    join, capping fan-out. No pairwise text comparison anywhere.
    """.format(span=_D15_SPAN, aw=_D15_ANCH, mod=_D15_MOD, mdf=_D15_MAX_DF)
    t = register(spark, sf_dir, ("documents",))
    grams = _cdc_grams(
        t["documents"].filter(F.length("text") >= _D15_ANCH + _D15_SPAN)
    )
    keep = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df")).filter(
        F.col("__df") <= _D15_MAX_DF
    )
    kept = grams.join(keep.select("g"), "g")
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


@query(
    "t19_langid_confusion",
    oracle=None,  # composed below from t01's oracle pieces — set after def
    tags=("llm", "text", "evaluation"),
)
def t19_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix for the t01 language-ID
    heuristic against the corpus's labeled ``lang`` column: one row per
    (labeled, predicted) cell with count and the share of the labeled
    class (recall when labeled == predicted). The query every
    filter-quality review starts from — is the lang filter silently
    dropping one language's documents?

    Scale: t01's stateless scoring plus two partial-agg groupBys (cells,
    then per-label totals re-derived from the cells — no second corpus
    scan); cell count ≤ |langs|², so everything after the scan is
    KB-sized.
    """
    t = register(spark, sf_dir, ("documents",))
    labeled = t["documents"].select("doc_id", "lang")
    pred = t19_langid_confusion.__wrapped_t01__(spark, sf_dir)
    cells = (
        labeled.join(pred, "doc_id")
        .groupBy(F.col("lang").alias("labeled_lang"), "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = cells.groupBy("labeled_lang").agg(F.sum("n_docs").alias("__tot"))
    return (
        cells.join(totals, "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n_docs",
            iround(F.col("n_docs") / F.col("__tot"), 4).alias("share_of_labeled"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


# wire t01 in without a circular import and give t19 a composed oracle
from dibimbing_case_study_etl_spark.queries.llm_ops import t01_lang_id as _t01  # noqa: E402

t19_langid_confusion.__wrapped_t01__ = staticmethod(_t01)

from dibimbing_case_study_etl_spark.queries import REGISTRY as _REG  # noqa: E402
import dataclasses as _dc  # noqa: E402

_t01_oracle = _REG["t01_lang_id"].oracle
_REG["t19_langid_confusion"] = _dc.replace(
    _REG["t19_langid_confusion"],
    oracle=f"""
    WITH pred AS ({_t01_oracle}),
    cells AS (
      SELECT d.lang AS labeled_lang, pred.predicted_lang, COUNT(*) AS n_docs
      FROM documents d JOIN pred ON d.doc_id = pred.doc_id
      GROUP BY d.lang, pred.predicted_lang
    ),
    tot AS (
      SELECT labeled_lang, SUM(n_docs) AS t FROM cells GROUP BY labeled_lang
    )
    SELECT labeled_lang, predicted_lang, n_docs,
           {sql_iround("CAST(n_docs AS DOUBLE) / t", 4)} AS share_of_labeled
    FROM cells JOIN tot USING (labeled_lang)
    ORDER BY labeled_lang, predicted_lang
    """,
)


@query(
    "s12_embedding_drift",
    oracle=f"""
    WITH dims AS (
      SELECT label, vec_id % 2 AS half,
             CAST(unnest(generate_series(1, len(embedding))) - 1 AS INTEGER) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, half, dim,
             (SUM(CAST(round_even(v * 1000000, 0) AS BIGINT)) / 1000000.0)
               / COUNT(*) AS c
      FROM dims GROUP BY label, half, dim
    ),
    diff AS (
      SELECT a.label, a.dim, (a.c - b.c) * (a.c - b.c) AS d2
      FROM cent a JOIN cent b
        ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
    ),
    agg AS (
      SELECT label,
             SUM(CAST(round_even(d2 * 100000000, 0) AS BIGINT)) / 100000000.0 AS ss
      FROM diff GROUP BY label
    )
    SELECT label, {sql_iround("sqrt(ss)", 4)} AS centroid_l2
    FROM agg
    ORDER BY label
    """,
    tags=("llm", "embedding", "drift", "monitoring"),
)
def s12_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift detector: per-label L2 distance between the
    centroids of two deterministic corpus halves (vec_id parity). On a
    healthy corpus the halves are exchangeable and the distance is small;
    a drifted ingest (new scraper, changed embedder version, poisoned
    source) shows up as a per-label spike — the monitoring query a
    continuous embedding pipeline alerts on.

    Scale: one posexplode feeds a (label, half, dim)-keyed partial agg —
    combine-heavy, ~|labels|·2·|dims| output rows regardless of corpus
    size; the half-vs-half join and the final per-label reduction operate
    on that model-sized table. Per-dim sums and the squared-difference
    reduction both round to scaled integers before summation, so no
    accumulation order can flip the hash.
    """
    t = register(spark, sf_dir, ("embeddings",))
    from dibimbing_case_study_etl_spark.functions.oracle_safe import dsum

    dims = t["embeddings"].select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    )
    cent = dims.groupBy("label", "half", "dim").agg(
        (dsum(F.col("v"), 6) / F.count(F.lit(1))).alias("c")
    )
    a = cent.filter(F.col("half") == 0).select("label", "dim", F.col("c").alias("ca"))
    b = cent.filter(F.col("half") == 1).select("label", "dim", F.col("c").alias("cb"))
    diff = a.join(b, ["label", "dim"]).select(
        "label", ((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))).alias("d2")
    )
    return (
        diff.groupBy("label")
        .agg(dsum(F.col("d2"), 8).alias("ss"))
        .select("label", iround(F.sqrt("ss"), 4).alias("centroid_l2"))
        .orderBy("label")
    )


@query(
    "t20_tokenizer_fertility",
    oracle=None,  # composed below from t15's oracle — set after def
    tags=("llm", "text", "tokenize", "evaluation"),
)
def t20_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer audit per source: token mass, UNK share, and fertility
    (tokens emitted per 1000 characters) under the t15 vocabulary — the
    three numbers that decide whether a vocab is too small for a source
    (UNK spike) or a source is degenerate for the tokenizer (fertility
    spike). Composes t15's encoding verbatim, so the audited tokenizer is
    exactly the one the pipeline ships.

    Scale: t15's scan-speed encode followed by a source-keyed partial agg
    (|sources| rows); the per-source char mass joins from a second
    partial agg of the documents scan — both model-sized.
    """
    from dibimbing_case_study_etl_spark.queries.llm_ops3 import t15_tokenize_ids

    t = register(spark, sf_dir, ("documents",))
    ids = t15_tokenize_ids(spark, sf_dir)
    src = t["documents"].select("doc_id", "source", F.length("text").alias("__chars"))
    tok_stats = (
        ids.join(src.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("token_id") == 0).cast("bigint")).alias("n_unk"),
        )
    )
    char_mass = src.groupBy("source").agg(F.sum("__chars").alias("__chars"))
    return (
        tok_stats.join(char_mass, "source")
        .select(
            "source",
            "n_tokens",
            "n_unk",
            iround(F.col("n_unk") / F.col("n_tokens"), 4).alias("unk_rate"),
            iround(F.col("n_tokens") * 1000.0 / F.col("__chars"), 4).alias(
                "tokens_per_1000_chars"
            ),
        )
        .orderBy("source")
    )


from dibimbing_case_study_etl_spark.queries import REGISTRY as _REG2  # noqa: E402

_t15_oracle = _REG2["t15_tokenize_ids"].oracle
_REG2["t20_tokenizer_fertility"] = _dc.replace(
    _REG2["t20_tokenizer_fertility"],
    oracle=f"""
    WITH ids AS ({_t15_oracle}),
    src AS (
      SELECT doc_id, source, CAST(length(text) AS BIGINT) AS chars FROM documents
    ),
    tok AS (
      SELECT src.source, COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN ids.token_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
      FROM ids JOIN src USING (doc_id)
      GROUP BY src.source
    ),
    cm AS (SELECT source, SUM(chars) AS chars FROM src GROUP BY source)
    SELECT tok.source, n_tokens, n_unk,
           {sql_iround("CAST(n_unk AS DOUBLE) / n_tokens", 4)} AS unk_rate,
           {sql_iround("n_tokens * 1000.0 / chars", 4)} AS tokens_per_1000_chars
    FROM tok JOIN cm USING (source)
    ORDER BY tok.source
    """,
)
