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
from dibimbing_case_study_etl_spark.functions.text import (
    fingerprint,
    sql_fingerprint,
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
