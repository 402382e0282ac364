"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns plus a typed metadata struct, processed with
Arrow-batched ``mapInPandas``.

The decode step is STUBBED in this build — the container has no
image/audio libraries — but everything Spark-side is real and tested:
schema, batching, partitioning, and the UDF signature. A deployment drops
a real decoder into :func:`decode_features`' ``_decode_real`` and nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "doc_id bigint, content binary, meta struct<format string, n_bytes bigint>"
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, checksum bigint"
IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, orig_w bigint, orig_h bigint, new_w bigint, new_h bigint, "
    "n_pixels bigint, checksum bigint"
)


def to_blob_table(df: DataFrame, id_col: str, text_col: str, fmt: str = "txt") -> DataFrame:
    """Pack content into the canonical multimodal layout: opaque binary +
    metadata struct. Here the 'blob' is the UTF-8 text bytes (deterministic
    stand-in for an image/audio payload)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_real(blob: bytes) -> dict:
    raise NotImplementedError(
        "real image/audio decode requires libraries not present in this "
        "container; deploy with Pillow/torchaudio and implement here"
    )


def decode_features(blobs: DataFrame, stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps the operator partition-parallel (one Python worker
    per partition, Arrow record batches — never row-at-a-time). The stub
    emits deterministic features (byte length + additive checksum) so the
    full distributed path is exercised and oracle-checkable.
    """
    # spread across cores first: a single-file input would otherwise run the
    # (expensive, real-decode) Python stage on one worker
    blobs = blobs.repartition(blobs.sparkSession.sparkContext.defaultParallelism, "doc_id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if stub:
                content = pdf["content"]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": content.map(len).astype("int64"),
                        "checksum": content.map(lambda b: sum(b) % 65536).astype("int64"),
                    }
                )
            else:  # pragma: no cover - deployment path
                rows = [_decode_real(b) for b in pdf["content"]]
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)


def synth_image_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake-image table: the content is the document's bytes
    (stand-in pixels) and the typed metadata struct carries dimensions
    derived from the id — exercising the real multimodal layout (binary +
    struct<format, width, height>) without image libraries."""
    content = F.encode(F.col(text_col), "UTF-8")
    did = F.col(id_col).cast("bigint")
    return df.select(
        did.alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit("fake-rgb").alias("format"),
            (16 + did % 64).alias("width"),
            (16 + (did * 7) % 64).alias("height"),
        ).alias("meta"),
    )


def resize_images(images: DataFrame, stub: bool = True) -> DataFrame:
    """'Resize' pass over the image table via Arrow-batched ``mapInPandas``:
    halves each dimension (floor, min 1) and reports the resulting pixel
    count plus a content checksum. The pixel decode/resample itself is the
    stubbed step (`_decode_real`); the metadata math, batching, schema, and
    partitioning are the real deployment shape."""
    images = images.repartition(images.sparkSession.sparkContext.defaultParallelism, "doc_id")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not stub:  # pragma: no cover - deployment path
                [_decode_real(b) for b in pdf["content"]]
            w = pdf["meta"].map(lambda m: m["width"]).astype("int64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int64")
            new_w = (w // 2).clip(lower=1)
            new_h = (h // 2).clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w,
                    "orig_h": h,
                    "new_w": new_w,
                    "new_h": new_h,
                    "n_pixels": new_w * new_h,
                    "checksum": pdf["content"].map(lambda b: sum(b) % 65536).astype("int64"),
                }
            )

    return images.mapInPandas(resize, schema=IMAGE_FEATURE_SCHEMA)
