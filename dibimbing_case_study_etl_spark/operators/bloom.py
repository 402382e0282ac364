"""Broadcast bloom-filter membership prefilter.

The scale pattern behind d13 (bloom decontamination): when one side of a
membership test is small BY CONTRACT (held-out benchmark shingles, a
blocklist, a sanctions set), collapsing it to a bit array and broadcasting
THAT — instead of shuffling the big side into a join — turns the join's
shuffle into a map-stage filter. A bloom filter has no false negatives,
so following the prefilter with an exact (now tiny) verification join
preserves exact semantics; the same candidates-then-verify contract d03
(MinHash-LSH) and s03 (GEMM prefilter) already use.

All probing is vectorized numpy over Arrow batches (mapInPandas); hashes
are computed JVM-side (``xxhash64``), so Python never touches strings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# golden-ratio odd multiplier (splitmix64 finalizer constant): derives the
# second hash from the first so one 64-bit hash per row suffices.
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(h: np.ndarray, i: int, mask: np.uint64) -> np.ndarray:
    h2 = (h ^ (h >> np.uint64(31))) * _MIX
    return (h + np.uint64(i) * h2) & mask


def build_bloom(hashes, bits_per_item: int = 20, n_hashes: int = 5):
    """Bit array (uint8-packed) sized to the next power of two ≥
    ``bits_per_item × n`` — ~1% FPR at the defaults. ``hashes`` are signed
    int64 (``xxhash64`` output); view-cast, never value-cast, so negative
    hashes keep their bit pattern. Returns ``(bits, m_mask, n_hashes)``;
    feed to :func:`bloom_prefilter`."""
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    m = 1 << int(max(6, np.ceil(np.log2(max(1, len(h)) * bits_per_item))))
    mask = np.uint64(m - 1)
    bits = np.zeros(m >> 3, dtype=np.uint8)
    for i in range(n_hashes):
        pos = _positions(h, i, mask)
        np.bitwise_or.at(bits, pos >> np.uint64(3), np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits, mask, n_hashes


def might_contain(bits: np.ndarray, mask: np.uint64, n_hashes: int, h: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True ⇒ maybe member (FPR applies),
    False ⇒ definitely not a member."""
    h = np.asarray(h, dtype=np.int64).view(np.uint64)
    hit = np.ones(len(h), dtype=bool)
    for i in range(n_hashes):
        pos = _positions(h, i, mask)
        hit &= (bits[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return hit


def bloom_prefilter(df: DataFrame, hash_col: str, bloom_state) -> DataFrame:
    """Keep only rows whose ``hash_col`` (int64, e.g. ``xxhash64``) might be
    in the bloom. Pure map stage — the bit array rides the closure as a
    Spark broadcast, no shuffle, no Python string handling."""
    sc = df.sparkSession.sparkContext
    bcast = sc.broadcast(bloom_state)
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits, mask, k = bcast.value
        for pdf in batches:
            h = pdf[hash_col].to_numpy(dtype=np.int64)
            yield pdf[might_contain(bits, mask, k, h)]

    return df.mapInPandas(gen, schema)
