"""Minimal YUV4MPEG2 (``.y4m``) codec for the multimodal path.

Y4M is the public uncompressed video interchange format (mjpegtools /
``yuv4mpeg(5)``): a plain-text stream header — ``YUV4MPEG2 W<w> H<h>
F<num>:<den> … C<colourspace>\\n`` — followed by one ``FRAME\\n`` marker
before each raw plane dump. With ``Cmono`` every frame is a single
``W*H`` 8-bit luma plane, so the whole container parses with stdlib
only — the video analogue of ``functions/audio.py``'s RIFF/WAVE subset
and ``functions/imaging.py``'s PNG subset.

Scope: the ENCODER always writes ``Cmono`` progressive streams (it
exists for deterministic fixtures); the DECODER reads any frame rate /
aspect tokens but requires ``Cmono`` — anything else raises loudly,
never wrong pixels. A deployment with ffmpeg extends ``decode_video``
the same way Pillow extends ``decode_image``.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 24) -> bytes:
    """Encode a uint8 array of shape (n_frames, H, W) as a spec-valid
    greyscale (``Cmono``) YUV4MPEG2 stream."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"expected (n_frames, H, W), got shape {a.shape}")
    n, h, w = a.shape
    header = f"YUV4MPEG2 W{w} H{h} F{int(fps)}:1 Ip A1:1 Cmono\n".encode("ascii")
    return header + b"".join(b"FRAME\n" + a[i].tobytes() for i in range(n))


def decode_y4m(blob: bytes) -> tuple[int, np.ndarray]:
    """Decode a ``Cmono`` YUV4MPEG2 stream to ``(fps_numerator, frames)``
    with ``frames`` a uint8 array of shape (n_frames, H, W). The stream
    header is token-parsed (W/H/F/C); every frame boundary is verified
    against the ``FRAME`` marker, so a truncated or misaligned payload
    raises instead of yielding shifted pixels."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 byte stream")
    w = h = fps = None
    colourspace = "420jpeg"  # the spec default when no C tag is present
    for tok in blob[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            fps = int(val.split(":")[0])
        elif tag == "C":
            colourspace = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H tokens")
    if colourspace != "mono":
        raise ValueError(
            f"unsupported Y4M colourspace {colourspace!r}; this decoder "
            "reads Cmono (single luma plane) streams only"
        )
    frame_size, pos, frames = w * h, nl + 1, []
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt Y4M frame marker at byte {pos}")
        start = fnl + 1
        if start + frame_size > len(blob):
            raise ValueError("truncated Y4M frame payload")
        frames.append(
            np.frombuffer(blob[start : start + frame_size], dtype=np.uint8).reshape(h, w)
        )
        pos = start + frame_size
    return int(fps or 0), np.stack(frames) if frames else np.empty((0, h, w), np.uint8)
