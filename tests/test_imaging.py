"""PNG codec unit tests: the dependency-free encoder/decoder pair that
makes the multimodal decode path genuinely executable in this container
(functions/imaging.py). The m07 registry query pins the same round trip
corpus-wide through the DuckDB oracle; these pin the codec edge cases."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dibimbing_case_study_etl_spark.functions.imaging import (
    _chunk,
    _PNG_MAGIC,
    decode_image,
    decode_png,
    encode_png,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (5, 7, 3), (4, 9, 4)])
def test_round_trip_exact(shape):
    arr = _rng(1).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_decode_image_falls_back_without_pillow():
    """decode_image must work in this container (no Pillow): same bytes,
    same pixels as the direct subset decoder."""
    arr = _rng(2).integers(0, 256, size=(9, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(arr)), arr)


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    the encoder only emits filter 0, so decoder support for Sub/Up/
    Average/Paeth needs explicitly crafted streams."""
    h, w = arr.shape[:2]
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    a = arr.reshape(h, w * channels).astype(np.int16)
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    prev = np.zeros(w * channels, dtype=np.int16)
    raw = b""
    for y, ftype in zip(range(h), filters):
        line = a[y]
        if ftype == 0:
            enc = line
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(channels, np.int16), line[:-channels]])
            enc = (line - left) % 256
        elif ftype == 2:  # Up
            enc = (line - prev) % 256
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(channels, np.int16), line[:-channels]])
            enc = (line - (left + prev) // 2) % 256
        elif ftype == 4:  # Paeth (predictor per spec)
            left = np.concatenate([np.zeros(channels, np.int16), line[:-channels]])
            ul = np.concatenate([np.zeros(channels, np.int16), prev[:-channels]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (line - pred) % 256
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 3])
def test_decoder_handles_all_filter_types(channels):
    shape = (5, 6) if channels == 1 else (5, 6, channels)
    arr = _rng(3).integers(0, 256, size=shape, dtype=np.uint8)
    blob = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(blob), arr)


def test_decoder_rejects_non_png_and_unsupported_variants():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"plain text payload")
    # 16-bit depth is outside the subset: patch depth byte in IHDR
    arr = np.zeros((2, 2), dtype=np.uint8)
    blob = bytearray(encode_png(arr))
    ihdr_off = len(_PNG_MAGIC) + 8  # length+tag
    depth_off = ihdr_off + 8
    blob[depth_off] = 16
    # fix the CRC so the tamper isn't mistaken for corruption handling
    payload = bytes(blob[ihdr_off : ihdr_off + 13])
    crc = zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF
    blob[ihdr_off + 13 : ihdr_off + 17] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(bytes(blob))


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError, match="unsupported array shape"):
        encode_png(np.zeros((2, 2, 2), dtype=np.uint8))


# --- WAV subset codec (functions/audio.py — the m07 precedent for audio) ---


def test_wav_roundtrip_exact():
    import numpy as np

    from dibimbing_case_study_etl_spark.functions.audio import decode_wav, encode_wav

    rng = np.arange(-32768, 32768, 997, dtype=np.int16)
    blob = encode_wav(rng, 16000)
    sr, out = decode_wav(blob)
    assert sr == 16000
    assert np.array_equal(out, rng)


def test_wav_header_is_spec_valid_riff():
    import struct

    import numpy as np

    from dibimbing_case_study_etl_spark.functions.audio import encode_wav

    blob = encode_wav(np.array([0, 1, -1], dtype=np.int16), 8000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    (riff_size,) = struct.unpack("<I", blob[4:8])
    assert riff_size == len(blob) - 8  # the RIFF size invariant
    assert blob[12:16] == b"fmt " and b"data" in blob


def test_wav_decoder_skips_foreign_chunks_and_rejects_bad_variants():
    import struct

    import numpy as np
    import pytest

    from dibimbing_case_study_etl_spark.functions.audio import decode_wav, encode_wav

    samples = np.array([5, -7, 9], dtype=np.int16)
    blob = bytearray(encode_wav(samples, 44100))
    # splice a LIST/INFO chunk (odd size → pad byte) between fmt and data,
    # the way real encoders do — the chunk walk must skip it
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    fmt_end = blob.index(b"data")
    spliced = bytes(blob[:fmt_end]) + info + bytes(blob[fmt_end:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, out = decode_wav(spliced)
    assert sr == 44100 and np.array_equal(out, samples)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")  # not WAVE
    # stereo is outside the subset contract
    stereo = bytearray(encode_wav(samples, 8000))
    i = stereo.index(b"fmt ") + 8
    stereo[i + 2 : i + 4] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(stereo))


def test_y4m_roundtrip_exact():
    import numpy as np

    from dibimbing_case_study_etl_spark.functions.video import decode_y4m, encode_y4m

    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (5, 6, 9), dtype=np.uint8)
    fps, back = decode_y4m(encode_y4m(frames, fps=30))
    assert fps == 30
    assert back.shape == frames.shape and np.array_equal(back, frames)


def test_y4m_header_is_spec_valid():
    import numpy as np

    from dibimbing_case_study_etl_spark.functions.video import encode_y4m

    blob = encode_y4m(np.zeros((2, 4, 8), np.uint8), fps=24)
    header = blob[: blob.index(b"\n")].decode("ascii")
    toks = header.split(" ")
    assert toks[0] == "YUV4MPEG2"
    assert "W8" in toks and "H4" in toks and "F24:1" in toks and "Cmono" in toks
    # frame markers sit exactly one frame_size apart
    first = blob.index(b"FRAME\n")
    assert blob[first + 6 + 32 : first + 6 + 32 + 6] == b"FRAME\n"


def test_y4m_decoder_rejects_bad_streams():
    import numpy as np
    import pytest

    from dibimbing_case_study_etl_spark.functions.video import decode_y4m, encode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"MPEG4 W4 H4\n")  # wrong magic
    with pytest.raises(ValueError):  # non-mono colourspace is outside the subset
        decode_y4m(b"YUV4MPEG2 W2 H2 F24:1 C420jpeg\n" + b"FRAME\n" + bytes(6))
    good = encode_y4m(np.zeros((2, 3, 3), np.uint8))
    with pytest.raises(ValueError):  # truncated final frame
        decode_y4m(good[:-2])
    with pytest.raises(ValueError):  # corrupt frame marker
        decode_y4m(good.replace(b"FRAME\n", b"FRAMS\n", 1))


def test_box_resize_matches_exact_integer_reference():
    """resize_images_real's kernel: decode→2×2 floor-mean box filter must
    equal the direct integer reference on the tiled fixture pixels."""
    import numpy as np

    from dibimbing_case_study_etl_spark.functions.imaging import decode_png, encode_png

    text = b"The quick brown fox jumps over the lazy dog 0123456789"
    for did in (0, 1, 5, 8, 13):
        w, h = 8 + did % 9, 8 + (did * 3) % 9
        px = np.resize(np.frombuffer(text, np.uint8), (h, w))
        a = decode_png(encode_png(px)).astype(np.int64)
        oh, ow = h // 2, w // 2
        b = a[: 2 * oh, : 2 * ow]
        out = (b[0::2, 0::2] + b[0::2, 1::2] + b[1::2, 0::2] + b[1::2, 1::2]) // 4
        ref = np.empty((oh, ow), np.int64)
        for y in range(oh):
            for x in range(ow):
                ref[y, x] = int(a[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].sum()) // 4
        assert np.array_equal(out, ref), did


# -- JPEG subset codec (functions/jpeg.py) -----------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (5, 7), (16, 24), (13, 9), (1, 1)])
def test_jpeg_constant_round_trip_exact(shape):
    """Constant images are the exactly-reconstructible JPEG subclass
    (DC-only blocks under unit quantization) — byte-exact at any
    geometry, including edge-padded non-multiple-of-8 sizes."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for v in (0, 17, 128, 255):
        a = np.full(shape, v, dtype=np.uint8)
        d = decode_jpeg_gray(encode_jpeg_gray(a))
        assert d.shape == a.shape and (d == a).all()


def test_jpeg_block_constant_round_trip_exact():
    """Block-constant images (one gray per 8x8 block, multiple-of-8
    geometry) round-trip exactly — the m14 fixture contract, which also
    exercises DC differential coding across blocks."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    g = np.array([[3, 250, 128], [17, 0, 99]], dtype=np.uint8)
    a = np.kron(g, np.ones((8, 8), dtype=np.uint8))
    d = decode_jpeg_gray(encode_jpeg_gray(a))
    assert (d == a).all()


def test_jpeg_general_round_trip_within_t81_tolerance():
    """Arbitrary images with the unit quantization table: T.81's
    conformance clause allows ±1/pixel IDCT rounding — pin it."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    for shape in ((8, 8), (32, 32), (17, 23), (64, 48)):
        a = rng.integers(0, 256, shape).astype(np.uint8)
        d = decode_jpeg_gray(encode_jpeg_gray(a))
        assert d.shape == a.shape
        assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1
    grad = np.add.outer(np.arange(40), np.arange(60)).astype(np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(grad)) == grad).all()


def test_jpeg_decoder_rejects_non_jpeg_and_unsupported_variants():
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")
    blob = bytearray(encode_jpeg_gray(np.full((8, 8), 7, dtype=np.uint8)))
    # flip SOF0 (0xC0) to progressive SOF2 (0xC2): must refuse, not garble
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(bytes(blob))


def test_jpeg_decode_image_dispatch_without_pillow():
    """decode_image must route JPEG magic bytes to the subset JPEG
    decoder when Pillow is absent (it is in this container)."""
    from dibimbing_case_study_etl_spark.functions.imaging import decode_image
    from dibimbing_case_study_etl_spark.functions.jpeg import encode_jpeg_gray

    a = np.full((16, 8), 42, dtype=np.uint8)
    assert (decode_image(encode_jpeg_gray(a)) == a).all()


def test_jpeg_pillow_interop():
    """When Pillow IS installed: libjpeg must decode our bytes to the
    same constants, and our decoder must read Pillow's greyscale
    baseline output within the lossy tolerance. Skips without Pillow."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    a = np.kron(
        np.array([[9, 200], [77, 128]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    ours = encode_jpeg_gray(a)
    assert (np.asarray(PIL.open(io.BytesIO(ours))) == a).all()
    buf = io.BytesIO()
    PIL.fromarray(a, mode="L").save(buf, format="JPEG", quality=100)
    theirs = decode_jpeg_gray(buf.getvalue())
    assert int(np.abs(theirs.astype(int) - a.astype(int)).max()) <= 1


def _colour_baseline_jpeg_header() -> bytes:
    """Minimal marker stream for a 3-component (YCbCr, 4:2:0-subsampled
    luma) baseline JPEG — enough structure for a decoder to reach SOF0.
    Built from the public T.81 segment layout, no encoder involved."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += b"\x01\x22\x00"  # Y: 2x2 sampling
    sof += b"\x02\x11\x01"  # Cb: 1x1
    sof += b"\x03\x11\x01"  # Cr: 1x1
    return b"\xff\xd8" + seg(0xFFC0, sof) + b"\xff\xd9"


def test_jpeg_decoder_rejects_colour_and_subsampled_loudly():
    """Out-of-subset inputs must raise, never return wrong pixels: a
    3-component (colour) SOF0 and a chroma/luma-subsampled greyscale
    SOF0 both refuse before any entropy decoding."""
    import struct

    from dibimbing_case_study_etl_spark.functions.jpeg import decode_jpeg_gray

    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_gray(_colour_baseline_jpeg_header())

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    subsampled = (
        b"\xff\xd8"
        + seg(0xFFC0, struct.pack(">BHHB", 8, 16, 16, 1) + b"\x01\x22\x00")
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg_gray(subsampled)


def test_jpeg_colour_constant_ycbcr_roundtrip_exact():
    """A constant-YCbCr-plane 4:4:4 fixture round-trips EXACTLY: DC-only
    blocks with unit quantization reconstruct the integer planes, and the
    decode-side JFIF inverse transform is a deterministic function of
    those integers — the property the oracled colour query (m15) pins."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_ycbcr,
        ycbcr_to_rgb,
    )

    y = np.full((24, 17), 120, np.uint8)
    cb = np.full((24, 17), 90, np.uint8)
    cr = np.full((24, 17), 180, np.uint8)
    rgb = decode_jpeg_color(encode_jpeg_ycbcr(y, cb, cr))
    expected = ycbcr_to_rgb(np.stack([y, cb, cr], axis=-1))
    assert rgb.shape == (24, 17, 3)
    assert (rgb == expected).all()


def test_jpeg_colour_rgb_roundtrip_tolerance():
    """General RGB content through encode_jpeg_rgb → decode_jpeg_color:
    colour transform (two half-even roundings) + unit-quantized DCT keep
    every channel within ±3 of the source — the bound the T.81
    conformance tolerance plus double colour rounding allows."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_rgb,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    out = decode_jpeg_color(encode_jpeg_rgb(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_decode_dispatch_and_colour_guards():
    """decode_jpeg dispatches on component count; decode_jpeg_color
    refuses greyscale input and chroma-subsampled colour input loudly."""
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg,
        decode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_ycbcr,
    )

    g = np.full((9, 9), 33, np.uint8)
    assert decode_jpeg(encode_jpeg_gray(g)).shape == (9, 9)
    c = encode_jpeg_ycbcr(g, g, g)
    assert decode_jpeg(c).shape == (9, 9, 3)
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_color(encode_jpeg_gray(g))
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg_color(_colour_baseline_jpeg_header())


def test_decode_image_colour_jpeg_routes_to_pillow_or_raises():
    """The r8 verdict's colour-JPEG contract on the shared dispatch:
    WITH Pillow importable, decode_image hands colour JPEG to libjpeg
    and returns an (h, w, 3) array; WITHOUT it, the built-in decoder
    handles 4:4:4 colour itself (r10) and still raises loudly on
    chroma-subsampled input — under no configuration do wrong pixels
    come back."""
    from dibimbing_case_study_etl_spark.functions.imaging import decode_image

    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        # the guard header is 4:2:0-subsampled: built-in must refuse
        with pytest.raises(ValueError, match="subsampled"):
            decode_image(_colour_baseline_jpeg_header())
        # 4:4:4 colour now decodes through the built-in codec
        from dibimbing_case_study_etl_spark.functions.jpeg import encode_jpeg_rgb

        rgb = np.zeros((16, 16, 3), dtype=np.uint8)
        rgb[:, :, 0] = 200
        out = decode_image(encode_jpeg_rgb(rgb))
        assert out.shape == (16, 16, 3)
        assert abs(int(out[0, 0, 0]) - 200) <= 3 and int(out[0, 0, 1]) <= 3
        return
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(rgb, mode="RGB").save(buf, format="JPEG")
    out = decode_image(buf.getvalue())
    assert out.shape == (16, 16, 3)
