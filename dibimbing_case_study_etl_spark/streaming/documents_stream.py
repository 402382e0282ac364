"""Streaming ingest of training-corpus documents with inline hygiene —
the streaming twin of the t13/t02/t03 batch family: as document files
land, every micro-batch is PII-scrubbed, quality-scored and
token-counted in the SAME stateless map stage, and a running per-source
data card aggregates in complete mode.

The hygiene map is stateless (pure per-row regex + arithmetic), so it
adds ZERO streaming state — the only state is the per-source aggregate,
bounded by the number of sources. That is the architecture a continuous
100 TB/day corpus feed needs: scrub at ingest speed, aggregate small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dibimbing_case_study_etl_spark.functions.text import (
    pii_count,
    redact_pii,
    token_count,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(path)


def hygiene_pass(docs: DataFrame, min_tokens: int = 5) -> DataFrame:
    """Stateless per-document hygiene: redacted text, PII counts, token
    count, and a keep/drop quality flag. Works identically on a batch or
    streaming DataFrame (no state, no shuffle — scan-speed either way)."""
    n_pii = (
        pii_count(F.col("text"), "email")
        + pii_count(F.col("text"), "ipv4")
        + pii_count(F.col("text"), "phone")
    )
    n_tokens = token_count(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        redact_pii(F.col("text")).alias("clean_text"),
        n_pii.alias("n_pii"),
        n_tokens.alias("n_tokens"),
        (n_tokens >= min_tokens).alias("keep"),
    )


def source_data_card(clean: DataFrame) -> DataFrame:
    """Running per-source corpus card over the hygiene output: documents
    seen, kept, redactions applied, token mass. State is one row per
    source — bounded regardless of stream length."""
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.sum("n_pii").alias("n_redactions"),
        F.sum("n_tokens").alias("total_tokens"),
    )
