"""Minimal image codec for the multimodal path.

The deployment-grade decoder is Pillow (used automatically when
importable). This module adds a dependency-free fallback so the "real
decode" path is genuinely executable in this container: a spec-correct
subset PNG codec (8-bit greyscale/RGB/RGBA, non-interlaced) built on
stdlib ``zlib``/``struct`` only — PNG (RFC 2083 / ISO 15948) is public
knowledge and ~100 lines for this subset.

Scope notes: the ENCODER always writes filter-0 scanlines (it exists for
deterministic fixtures, not compression ratio); the DECODER implements all
five scanline filters (None/Sub/Up/Average/Paeth), so it also reads
PNGs produced by real encoders as long as they are 8-bit, non-interlaced,
non-palette. Everything else raises — loudly, never wrong pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (H, W) greyscale, (H, W, 3) RGB, or
    (H, W, 4) RGBA — as a valid non-interlaced PNG (filter 0 scanlines)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color_type = {3: 2, 4: 6}[a.shape[2]]
        channels = a.shape[2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (operands widened to
    int16 by the caller — the predictor is defined on exact differences)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit greyscale/RGB/RGBA PNG to a uint8
    array of shape (H, W) or (H, W, C). All five scanline filters are
    supported; anything outside the subset raises ValueError."""
    if blob[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG byte stream")
    pos, ihdr, idat = len(_PNG_MAGIC), None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color_type={color_type} "
            f"interlace={interlace}); this decoder reads 8-bit non-interlaced "
            "greyscale/RGB/RGBA only"
        )
    channels = _CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: + left (per channel), sequential
            cur = line.copy()
            for i in range(channels, stride):
                cur[i] = (int(cur[i]) + int(cur[i - channels])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - channels]) if i >= channels else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                c = int(prev[i - channels]) if i >= channels else 0
                b = int(prev[i])
                cur[i] = (int(line[i]) + int(_paeth(np.int16(a), np.int16(b), np.int16(c)))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


_PIL_IMAGE = None  # resolved once per process — see decode_image


def _pil_image():
    """Resolve Pillow ONCE per process (r12): a failed ``from PIL import
    Image`` is NOT cached by Python, so the old per-call try/except paid a
    full sys.path probe for every decoded image on Pillow-less deployments
    — pure per-row overhead in the hottest multimodal kernels (guide §4.5:
    heavyweight init once per task, not per row)."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:  # soft dependency — absent in this container, present in deploys
            from PIL import Image  # type: ignore

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    return _PIL_IMAGE


def decode_image(blob: bytes) -> np.ndarray:
    """Decode image bytes to a uint8 numpy array: Pillow when importable
    (any format Pillow knows), else the built-in subset codecs dispatched
    on magic bytes — PNG here, baseline greyscale + 4:4:4 colour JPEG in
    ``functions/jpeg.py`` (chroma-subsampled JPEG still needs Pillow and
    raises loudly without it)."""
    Image = _pil_image()
    if Image:
        import io

        return np.asarray(Image.open(io.BytesIO(blob)))
    if blob[:2] == b"\xff\xd8":
        from dibimbing_case_study_etl_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(blob)
    return decode_png(blob)
