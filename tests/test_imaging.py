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


def _colour_baseline_jpeg_header(hv_y: int = 0x22) -> bytes:
    """Minimal marker stream for a 3-component YCbCr baseline JPEG —
    enough structure for a decoder to reach SOF0 (no scan follows).
    Built from the public T.81 segment layout, no encoder involved."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([0x01, hv_y, 0x00])  # Y sampling per caller
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
    # sampling factors beyond 2 stay out-of-subset (4:2:0/4:2:2 decode
    # since r11; a 3x1 luma declaration still refuses loudly)
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg_color(_colour_baseline_jpeg_header(hv_y=0x31))


def test_decode_image_colour_jpeg_routes_to_pillow_or_raises():
    """The r8 verdict's colour-JPEG contract on the shared dispatch:
    WITH Pillow importable, decode_image hands colour JPEG to libjpeg
    and returns an (h, w, 3) array; WITHOUT it, the built-in decoder
    handles 4:4:4 AND 4:2:0 colour itself (r10/r11) and still raises
    loudly on out-of-subset sampling factors — under no configuration
    do wrong pixels come back."""
    from dibimbing_case_study_etl_spark.functions.imaging import decode_image

    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        # out-of-subset (3x1 luma) declaration: built-in must refuse
        with pytest.raises(ValueError, match="sampling factor"):
            decode_image(_colour_baseline_jpeg_header(hv_y=0x31))
        # 4:2:0 decodes through the built-in codec since r11
        from dibimbing_case_study_etl_spark.functions.jpeg import (
            encode_jpeg_ycbcr_420,
        )

        y420 = np.full((16, 16), 99, np.uint8)
        c420 = np.full((8, 8), 64, np.uint8)
        assert decode_image(encode_jpeg_ycbcr_420(y420, c420, c420)).shape == (16, 16, 3)
        # 4:4:4 colour decodes through the built-in codec
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


def test_colour_decode_rejects_non_ycbcr_colour_spaces():
    """The built-in colour decoder applies the JFIF YCbCr inverse
    transform unconditionally, so streams declaring another colour
    interpretation must raise rather than decode to wrong colours
    (r10 ADVICE): Adobe APP14 transform=0 (untransformed RGB) and
    non-JFIF component ids are refused; an explicit APP14 transform=1
    (YCbCr) still decodes byte-identically."""
    import numpy as np
    import pytest

    from dibimbing_case_study_etl_spark.functions.jpeg import (
        decode_jpeg_color,
        encode_jpeg_rgb,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    blob = encode_jpeg_rgb(img)
    baseline = decode_jpeg_color(blob)

    def with_app14(transform: int) -> bytes:
        seg = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
        app14 = b"\xff\xee" + (len(seg) + 2).to_bytes(2, "big") + seg
        return blob[:2] + app14 + blob[2:]

    # transform=1 (YCbCr) is what the decoder assumes: identical output
    assert np.array_equal(decode_jpeg_color(with_app14(1)), baseline)
    with pytest.raises(ValueError, match="APP14 transform=0"):
        decode_jpeg_color(with_app14(0))
    with pytest.raises(ValueError, match="APP14 transform=2"):
        decode_jpeg_color(with_app14(2))

    # non-JFIF component ids (no APP14 to disambiguate): refuse
    sof = blob.find(b"\xff\xc0")
    sos = blob.find(b"\xff\xda")
    assert sof > 0 and sos > sof
    mut = bytearray(blob)
    for c in range(3):  # SOF0 component ids 1,2,3 -> 4,5,6
        assert mut[sof + 10 + 3 * c] == c + 1
        mut[sof + 10 + 3 * c] = c + 4
    for c in range(3):  # SOS scan selectors follow suit
        assert mut[sos + 5 + 2 * c] == c + 1
        mut[sos + 5 + 2 * c] = c + 4
    with pytest.raises(ValueError, match="component ids"):
        decode_jpeg_color(bytes(mut))


def test_jpeg_420_exact_subclass_and_general_roundtrip():
    """4:2:0 decode (r11, r10 verdict ask #4): a fixture whose luma is
    constant per 8×8 and whose chroma is constant per 8×8 IN THE
    SUBSAMPLED DOMAIN round-trips exactly — DC-only blocks under unit
    quantization, decimation the identity, box upsampling its inverse.
    General content stays within the conformance tolerance, and 4:2:2
    (2×1 luma) streams decode through the same generalized MCU walk."""
    import struct

    from dibimbing_case_study_etl_spark.functions.jpeg import (
        _decode_baseline,
        decode_jpeg_color,
        encode_jpeg_ycbcr_420,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(420)
    one = np.ones((8, 8), np.uint8)
    for h, w in [(16, 16), (24, 40), (17, 19), (8, 8), (15, 30)]:
        ch, cw = (h + 1) // 2, (w + 1) // 2
        y = np.kron(
            rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8), dtype=np.uint8), one
        )[:h, :w]
        cb = np.kron(
            rng.integers(0, 256, ((ch + 7) // 8, (cw + 7) // 8), dtype=np.uint8), one
        )[:ch, :cw]
        cr = np.kron(
            rng.integers(0, 256, ((ch + 7) // 8, (cw + 7) // 8), dtype=np.uint8), one
        )[:ch, :cw]
        blob = encode_jpeg_ycbcr_420(y, cb, cr)
        # SOF0 declares 4:2:0 (Y 2x2)
        sof = blob.find(b"\xff\xc0")
        assert blob[sof + 11] == 0x22
        cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w]
        crf = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w]
        planes = _decode_baseline(blob, gray_only=False)
        assert np.array_equal(planes[0], y)
        assert np.array_equal(planes[1], cbf)
        assert np.array_equal(planes[2], crf)
        exp = ycbcr_to_rgb(np.stack([y, cbf, crf], axis=-1))
        assert np.array_equal(decode_jpeg_color(blob), exp)

    # general (non-block-constant) luma: DCT round-trip tolerance holds
    y = rng.integers(0, 256, (33, 47), dtype=np.uint8)
    cb = rng.integers(0, 256, (17, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, (17, 24), dtype=np.uint8)
    planes = _decode_baseline(encode_jpeg_ycbcr_420(y, cb, cr), gray_only=False)
    assert np.abs(planes[0].astype(int) - y.astype(int)).max() <= 1

    # 4:2:2: hand-build from the 4:2:0 stream is not possible, so craft
    # one via the generalized decoder contract — encode per-MCU manually
    # is overkill; instead pin that a (2,1) declaration walks the MCU
    # grid without error on a synthetic stream produced by re-encoding:
    # Y 2x1 means each MCU is 16x8 with two Y blocks + one Cb + one Cr.
    from dibimbing_case_study_etl_spark.functions.jpeg import (
        _BitWriter,
        _dct_quantize,
        _encode_block,
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
        _ZIGZAG,
    )

    h, w = 16, 32
    q = np.ones((8, 8), dtype=np.int64)
    y = np.kron(rng.integers(0, 256, (2, 4), dtype=np.uint8), one)
    cbs = np.kron(rng.integers(0, 256, (2, 2), dtype=np.uint8), one)
    crs = np.kron(rng.integers(0, 256, (2, 2), dtype=np.uint8), one)
    zzy, zcb, zcr = _dct_quantize(y, q), _dct_quantize(cbs, q), _dct_quantize(crs, q)
    bw_out = _BitWriter()
    prev = [0, 0, 0]
    for my in range(2):
        for mx in range(2):  # mcux = 32 / 16 = 2 (Y h=2) ... w/(8*2)=2
            for bx in range(2):
                prev[0] = _encode_block(bw_out, zzy[my, 2 * mx + bx], prev[0])
            prev[1] = _encode_block(bw_out, zcb[my, mx], prev[1])
            prev[2] = _encode_block(bw_out, zcr[my, mx], prev[2])
    bw_out.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    blob = bytearray(b"\xff\xd8")
    blob += seg(0xFFDB, b"\x00" + bytes(int(x) for x in q.reshape(64)[_ZIGZAG]))
    blob += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x21\x00\x02\x11\x00\x03\x11\x00",  # Y 2x1: 4:2:2
    )
    blob += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    blob += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    blob += seg(0xFFDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    blob += bw_out.buf + b"\xff\xd9"
    planes = _decode_baseline(bytes(blob), gray_only=False)
    assert np.array_equal(planes[0], y)
    assert np.array_equal(planes[1], np.repeat(cbs, 2, axis=1))  # h-only upsample
    assert np.array_equal(planes[2], np.repeat(crs, 2, axis=1))
