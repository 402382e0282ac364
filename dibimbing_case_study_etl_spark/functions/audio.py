"""Dependency-free WAV/PCM codec (RIFF WAVE, 16-bit mono PCM subset).

The m07 precedent applied to audio: a REAL subset codec built on stdlib
``struct`` + numpy only — RIFF WAVE is public (Microsoft/IBM 1991 spec;
the layout is also restated in RFC 2361) and 16-bit integer PCM is its
canonical encoding. Blobs produced here open in any audio tool, and
:func:`decode_wav` reads any spec-valid 16-bit mono PCM WAV regardless
of encoder (extra chunks like LIST/INFO are skipped per the RIFF chunk
-walk rules). Compressed codecs (MP3/AAC/OPUS) stay out of scope — they
need real decoder libraries and remain documented deployment stubs.

Reference behavior mirrored: the reference pipeline treats payloads as
opaque typed blobs and keeps metadata alongside
(``scripts/extract_open_meteo_to_minio.py`` stores raw JSON bodies the
same way); this module gives the audio column a genuinely decodable
format so the resample path is value-checked end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 sample vector as a canonical 16-bit mono PCM WAV
    (RIFF header + ``fmt `` + ``data``)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, 1, sample_rate, byte_rate, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit mono PCM WAV to ``(sample_rate, int16 samples)``.

    Walks the RIFF chunk list (skipping unknown chunks and their odd-size
    pad bytes, as the spec requires) and validates the PCM/mono/16-bit
    subset contract before touching the data.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE byte stream")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        payload = blob[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_chunk = payload
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt_chunk[:16]
    )
    if audio_format != _FMT_PCM or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format} channels={channels} "
            f"bits={bits}); this subset codec reads 16-bit mono PCM"
        )
    if len(data) % 2:
        raise ValueError("WAV data length is not sample-aligned")
    return sample_rate, np.frombuffer(data, dtype="<i2")
