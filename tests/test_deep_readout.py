"""Full-precision deep-sample readout (r10).

The 8-bit output contract everywhere reduces deep samples to their most
significant 8 bits (v >> (P-8), established r9).  The *_deep twins expose
the samples verbatim instead — (width, height, n_channels, bit_depth,
pixels) with little-endian uint16 bytes when bit_depth > 8 — retiring the
'full-precision readout needs cv2 IMREAD_UNCHANGED / PIL native modes'
residue (VERDICT r9 missing-list item 2) for every vendored-decodable
format.  Reference parity: cv2.imdecode(..., IMREAD_UNCHANGED) on camera
frames, projects/vehicle_count/scripts/vehicle_consumer.py:81-83.

Certification strategy (the r8/r9 codec-widening precedent): exact
roundtrips (the basis families quantize exactly, so deep decodes equal the
encoder's input bit-for-bit), MSB-consistency (the 8-bit decode must equal
the deep samples >> (P-8) wherever no color transform intervenes),
closed-form color checks, and mutation fuzz under the ValueError-or-success
drop contract."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
    decode_image,
    decode_image_deep,
    encode_bmp24,
)
from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
    decode_jpeg,
    decode_jpeg_deep,
    encode_jpeg_extended,
    encode_jpeg_gray,
    encode_jpeg_lossless,
    encode_jpeg_progressive_gray,
)
from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
    decode_png,
    decode_png_deep,
    encode_png,
)


def _sign():
    return np.where(np.isin(np.arange(8), (0, 3, 4, 7)), 1, -1)


def _basis12(w, h, seed=0):
    """12-bit basis-family raster (span{DC, (4,4)}), exact under flat-8."""
    sgn = _sign()
    wb = w // 8
    ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
    k = ky * wb + kx
    dc = (35 * k + 7 * seed) % 1601 - 800
    ac = (17 * k + 3 * seed) % 801 - 400
    img = 2048 + dc + ac * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
    assert img.min() >= 0 and img.max() < 4096
    return img


def _u16(px: bytes, shape) -> np.ndarray:
    return np.frombuffer(px, "<u2").reshape(shape)


# ---------------------------------------------------------------- JPEG


@pytest.mark.parametrize("seed", [0, 5, 11])
def test_jpeg_deep_12bit_sof1_exact(seed):
    """12-bit SOF1 greyscale: the basis family quantizes exactly, so the
    deep decode equals the 12-bit source VERBATIM (not just its MSB)."""
    w, h = 24, 16
    img = _basis12(w, h, seed)
    dw, dh, c, depth, px = decode_jpeg_deep(encode_jpeg_extended(w, h, img, precision=12))
    assert (dw, dh, c, depth) == (w, h, 1, 12)
    assert np.array_equal(_u16(px, (h, w)), img)


def test_jpeg_deep_12bit_progressive_exact():
    img = _basis12(24, 16, 3)
    payload = encode_jpeg_progressive_gray(24, 16, img, precision=12)
    dw, dh, c, depth, px = decode_jpeg_deep(payload)
    assert (dw, dh, c, depth) == (24, 16, 1, 12)
    assert np.array_equal(_u16(px, (16, 24)), img)


def test_jpeg_deep_msb_consistency_single_component():
    """For single-component frames the 8-bit contract IS the deep samples
    shifted right by P-8 — the two APIs must agree bit-for-bit."""
    img = _basis12(16, 8, 7)
    payload = encode_jpeg_extended(16, 8, img, precision=12)
    _, _, _, depth, px = decode_jpeg_deep(payload)
    flat = np.frombuffer(decode_jpeg(payload)[3], np.uint8).reshape(8, 16)
    assert np.array_equal(flat, (_u16(px, (8, 16)) >> (depth - 8)).astype(np.uint8))


def test_jpeg_deep_12bit_color_closed_form():
    """12-bit 4:4:4 color: exact 12-bit YCbCr planes through the JFIF
    transform at full precision (level 2048, ceiling 4095, floor(x+0.5))."""
    w, h = 16, 16
    # three independent basis-family planes: each quantizes exactly, so the
    # decoded YCbCr is bit-exact and the expected RGB is closed-form
    y12 = _basis12(w, h, 1)
    cb12 = _basis12(w, h, 9)
    cr12 = _basis12(w, h, 4)
    payload = encode_jpeg_extended(w, h, [y12, cb12, cr12], precision=12)
    dw, dh, c, depth, px = decode_jpeg_deep(payload)
    assert (dw, dh, c, depth) == (w, h, 3, 12)
    y, cb, cr = (p.astype(np.float64) for p in (y12, cb12 - 2048, cr12 - 2048))
    exp = np.stack(
        [
            np.floor(y + 1.402 * cr + 0.5),
            np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5),
            np.floor(y + 1.772 * cb + 0.5),
        ],
        axis=-1,
    )
    exp = np.clip(exp, 0, 4095).astype(np.uint16)
    assert np.array_equal(_u16(px, (h, w, 3)), exp)


@pytest.mark.parametrize("precision,pt", [(2, 0), (8, 0), (12, 2), (16, 0), (16, 3)])
def test_jpeg_deep_lossless_verbatim(precision, pt):
    """Lossless (SOF3): deep readout is the H.1 reconstruction verbatim at
    the declared precision — incl. the << Pt point-transform rescale."""
    rng = np.random.default_rng(precision * 31 + pt)
    samples = rng.integers(0, 1 << (precision - pt), (8, 12), dtype=np.int64)
    payload = encode_jpeg_lossless(12, 8, samples, precision=precision, point_transform=pt)
    dw, dh, c, depth, px = decode_jpeg_deep(payload)
    assert (dw, dh, c, depth) == (12, 8, 1, precision)
    expected = (samples << pt).astype(np.uint16)
    got = _u16(px, (8, 12)) if precision > 8 else np.frombuffer(px, np.uint8).reshape(8, 12)
    assert np.array_equal(got.astype(np.uint16), expected)


def test_jpeg_deep_8bit_identity():
    """8-bit frames: deep output is byte-identical to decode_jpeg with
    bit_depth 8 (baseline, and an 8-bit SOF1)."""
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, 24 * 16, dtype=np.uint8).tobytes()
    for payload in (
        encode_jpeg_gray(24, 16, g),
        encode_jpeg_extended(
            24, 16, np.frombuffer(g, np.uint8).reshape(16, 24).astype(np.int64), precision=8
        ),
    ):
        w, h, c, depth, px = decode_jpeg_deep(payload)
        assert depth == 8
        assert (w, h, c, px) == decode_jpeg(payload)


# ----------------------------------------------------------------- PNG


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_deep_16bit_verbatim(channels, interlace):
    rng = np.random.default_rng(channels * 7 + interlace)
    w, h = 11, 9
    img = rng.integers(0, 65536, (h, w, channels), dtype=np.uint16)
    payload = encode_png(
        w, h, img.astype(">u2").tobytes(), channels=channels, depth=16, interlace=interlace
    )
    dw, dh, c, depth, px = decode_png_deep(payload)
    assert (dw, dh, c, depth) == (w, h, channels, 16)
    shape = (h, w) if channels == 1 else (h, w, channels)
    assert np.array_equal(_u16(px, shape), img.reshape(shape))
    # MSB consistency with the 8-bit contract
    flat = np.frombuffer(decode_png(payload)[3], np.uint8).reshape(shape)
    assert np.array_equal(flat, (img.reshape(shape) >> 8).astype(np.uint8))


def test_png_deep_16bit_grey_alpha_expands_rgba():
    """16-bit grey+alpha normalizes to 4-channel RGBA at 16 bits — the
    same LA expansion contract as the 8-bit path."""
    rng = np.random.default_rng(12)
    w, h = 5, 4
    la = rng.integers(0, 65536, (h, w, 2), dtype=np.uint16)
    payload = encode_png(w, h, la.astype(">u2").tobytes(), channels=2, depth=16)
    dw, dh, c, depth, px = decode_png_deep(payload)
    assert (dw, dh, c, depth) == (w, h, 4, 16)
    assert np.array_equal(_u16(px, (h, w, 4)), la[:, :, [0, 0, 0, 1]])


def test_png_deep_8bit_and_palette_identity():
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    seq = encode_png(4, 6, img.tobytes(), channels=3)
    pal = encode_png_indexed(
        4, 6, bytes(rng.integers(0, 3, 24, dtype=np.uint8)),
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    )
    for payload in (seq, pal):
        w, h, c, depth, px = decode_png_deep(payload)
        assert depth == 8
        assert (w, h, c, px) == decode_png(payload)


# -------------------------------------------------------------- netpbm


def test_netpbm_two_byte_samples_decode():
    """2-byte netpbm (r10 widening — was a ValueError gate): big-endian
    samples; 8-bit contract reduces to the MSB of the DECLARED precision
    (maxval.bit_length()), deep returns them verbatim."""
    img = np.array([[0, 4095], [2048, 1]], dtype=np.uint16)
    payload = b"P5\n2 2\n4095\n" + img.astype(">u2").tobytes()
    assert decode_image_deep(payload) == (2, 2, 1, 12, img.astype("<u2").tobytes())
    w, h, c, px = decode_image(payload)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(2, 2), (img >> 4).astype(np.uint8)
    )
    # 16-bit maxval: P6 color
    rgb = np.arange(24, dtype=np.uint16) * 2730
    payload = b"P6\n4 2\n65535\n" + rgb.astype(">u2").tobytes()
    assert decode_image_deep(payload) == (4, 2, 3, 16, rgb.astype("<u2").tobytes())
    assert decode_image(payload)[3] == (rgb >> 8).astype(np.uint8).tobytes()


def test_netpbm_two_byte_encoder_roundtrip():
    """encode_pgm/encode_ppm grew a maxval param (r10): 2-byte payloads
    roundtrip verbatim through the deep decoder and reduce to the MSB of
    the declared precision through the 8-bit one."""
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
        encode_pgm,
        encode_ppm,
    )

    img = np.arange(12, dtype=np.uint16).reshape(3, 4) * 341
    payload = encode_pgm(4, 3, img, maxval=4095)
    assert decode_image_deep(payload) == (4, 3, 1, 12, img.astype("<u2").tobytes())
    rgb = np.arange(24, dtype=np.uint16) * 2730
    payload = encode_ppm(4, 2, rgb, maxval=65535)
    assert decode_image_deep(payload) == (4, 2, 3, 16, rgb.astype("<u2").tobytes())
    assert decode_image(payload)[3] == (rgb >> 8).astype(np.uint8).tobytes()
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([0, 1, 2, 70000]), maxval=65535)
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.zeros(4, np.int64), maxval=65536)


def test_netpbm_two_byte_rejects():
    for bad in (
        b"P5\n2 2\n4095\n" + bytes(7),  # truncated 2-byte raster
        b"P5\n2 2\n65536\n" + bytes(8),  # maxval above the spec ceiling
        b"P5\n2 2\n0\n",  # maxval 0
    ):
        with pytest.raises(ValueError):
            decode_image(bad)
        with pytest.raises(ValueError):
            decode_image_deep(bad)


def test_decode_image_deep_dispatch_8bit_formats():
    """BMP (always 24-bit) and 8-bit netpbm come back bit_depth 8,
    byte-identical to decode_image."""
    rgb = bytes(range(12))
    for payload in (encode_bmp24(2, 2, rgb), b"P6\n2 2\n255\n" + rgb):
        w, h, c, depth, px = decode_image_deep(payload)
        assert depth == 8
        assert (w, h, c, px) == decode_image(payload)


# -------------------------------------------------- Spark-side operator


def test_decode_image_pixels_deep_mixed_payloads(spark):
    """The Arrow-batched deep operator on the pure rung: full-precision
    means and bit depths for mixed deep/8-bit payloads, undecodable
    payloads dropped without killing the task."""
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        decode_image_pixels_deep,
    )

    img12 = _basis12(16, 8, 5)
    img16 = np.arange(12, dtype=np.uint16).reshape(3, 4) * 5000
    rows = [
        (1, encode_jpeg_extended(16, 8, img12, precision=12)),
        (2, encode_png(4, 3, img16.astype(">u2").tobytes(), channels=1, depth=16)),
        (3, encode_bmp24(2, 2, bytes(range(12)))),
        (4, b"definitely not an image"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_pixels_deep(media).collect()}
    assert sorted(got) == [1, 2, 3]
    assert (got[1]["bit_depth"], got[1]["n_channels"]) == (12, 1)
    assert got[1]["mean_intensity"] == int(img12.sum()) / img12.size  # 12-bit scale
    assert (got[2]["bit_depth"], got[2]["width"], got[2]["height"]) == (16, 4, 3)
    assert got[2]["mean_intensity"] == int(img16.sum()) / img16.size
    assert (got[3]["bit_depth"], got[3]["mean_intensity"]) == (8, sum(range(12)) / 12)


# ------------------------------------- cross-rung ladder consistency (r11)


def test_ladder_routes_declared_precision_payloads_to_vendored():
    """ADVICE r10 items 1+2: payloads where an installed library's notion
    of sample precision diverges from the declared one (2-byte netpbm with
    non-65535 maxval on cv2/PIL; 16-bit color PNG on PIL) must route
    through the vendored codec on EVERY rung — the rung dispatch
    short-circuits before touching the library, so this is testable with
    mod=None even though cv2/PIL are absent here."""
    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
        _decode_to_array_deep,
    )

    # maxval=1000: cv2 would read raw CV_16U (depth 16, v>>8); the declared
    # precision is bit_length(1000)=10, readout v>>2
    grey = np.array([[0, 1000], [512, 3]], dtype=np.uint16)
    pgm = b"P5\n2 2\n1000\n" + grey.astype(">u2").tobytes()
    for kind in ("cv2", "pil"):
        arr, depth = _decode_to_array_deep(kind, None, pgm)
        assert depth == 10
        assert np.array_equal(arr, grey)
        flat = _decode_to_array(kind, None, pgm)
        assert flat.dtype == np.uint8
        assert np.array_equal(flat, (grey >> 2).astype(np.uint8))
    pure = _decode_to_array_deep("pure", imagecodec, pgm)
    assert pure[1] == 10 and np.array_equal(pure[0], grey)

    # 16-bit RGB PNG: PIL would silently open as 8-bit "RGB" (depth 8,
    # ~256x smaller mean); the ladder must report depth 16 verbatim
    rgb16 = (np.arange(24, dtype=np.uint16) * 2700).reshape(2, 4, 3)
    png = encode_png(4, 2, rgb16.astype(">u2").tobytes(), channels=3, depth=16)
    arr, depth = _decode_to_array_deep("pil", None, png)
    assert depth == 16
    assert np.array_equal(arr, rgb16)
    assert np.array_equal(_decode_to_array("pil", None, png),
                          (rgb16 >> 8).astype(np.uint8))


def test_ladder_falls_back_to_vendored_when_rung_drops():
    """ADVICE r10 item 4: the ladder resolves ONE backend per worker, so a
    cv2/PIL rung that cannot decode a payload the vendored codec supports
    must fall through to it instead of dropping the row (12-bit JPEG under
    stock libjpeg, float EXR dtypes)."""
    from types import SimpleNamespace

    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
        _decode_to_array_deep,
    )

    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    expect = np.frombuffer(bytes(range(12)), np.uint8).reshape(2, 2, 3)
    # cv2 rung whose imdecode rejects the payload (returns None)
    rejecting = SimpleNamespace(imdecode=lambda *_: None, IMREAD_UNCHANGED=-1)
    assert np.array_equal(_decode_to_array("cv2", rejecting, ppm), expect)
    arr, depth = _decode_to_array_deep("cv2", rejecting, ppm)
    assert depth == 8 and np.array_equal(arr, expect)
    # cv2 rung returning a dtype outside the uint contract (float EXR)
    floaty = SimpleNamespace(
        imdecode=lambda *_: np.zeros((2, 2), np.float32), IMREAD_UNCHANGED=-1
    )
    assert np.array_equal(_decode_to_array("cv2", floaty, ppm), expect)
    assert _decode_to_array_deep("cv2", floaty, ppm)[1] == 8
    # PIL rung that cannot open the payload at all
    class _Boom:
        @staticmethod
        def open(_):
            raise OSError("cannot identify image file")

    assert np.array_equal(_decode_to_array("pil", _Boom, ppm), expect)
    assert np.array_equal(_decode_to_array_deep("pil", _Boom, ppm)[0], expect)
    # genuinely undecodable payloads still drop on every rung
    for kind, mod in (("cv2", rejecting), ("pil", _Boom)):
        assert _decode_to_array(kind, mod, b"not an image") is None
        assert _decode_to_array_deep(kind, mod, b"not an image") is None


def test_cv2_rung_uint16_reduces_to_msb_in_8bit_ladder():
    """A cv2 rung returning uint16 (16-bit TIFF etc., outside the
    pre-route) must reduce to the most significant byte in the 8-bit
    ladder — the engine-wide v >> (P-8) contract — not leak uint16 means
    256x the documented range."""
    from types import SimpleNamespace

    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
    )

    bgr16 = (np.arange(12, dtype=np.uint16) * 5000).reshape(2, 2, 3)
    fake = SimpleNamespace(imdecode=lambda *_: bgr16.copy(), IMREAD_UNCHANGED=-1)
    got = _decode_to_array("cv2", fake, b"\x00\x00irrelevant")
    assert got.dtype == np.uint8
    assert np.array_equal(got, (bgr16 >> 8).astype(np.uint8)[:, :, ::-1])


def test_ladder_holds_drop_contract_under_mutation():
    """Fuzz the r11 ladder front-end (_prefers_vendored header peek +
    vendored fallback): for ANY payload bytes, the ladder must return a
    result or None — never raise — on every rung (2k mutations here;
    byte-flip / truncate / splice over netpbm/PNG seeds so the header
    peek sees near-valid garbage)."""
    import random
    from types import SimpleNamespace

    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
        _decode_to_array_deep,
    )

    rng = random.Random(1100)
    seeds = [
        b"P5\n2 2\n1000\n" + bytes(8),
        b"P6\n2 2\n255\n" + bytes(12),
        encode_png(2, 2, bytes(8), channels=1, depth=16),
        b"P5 2 2 70000 " + bytes(8),
    ]
    rejecting = SimpleNamespace(imdecode=lambda *_: None, IMREAD_UNCHANGED=-1)

    class _Boom:
        @staticmethod
        def open(_):
            raise OSError("nope")

    for i in range(2000):
        s = bytearray(rng.choice(seeds))
        op = i % 3
        if op == 0:
            s[rng.randrange(len(s))] = rng.randrange(256)
        elif op == 1:
            s = s[: rng.randrange(0, len(s))]
        else:
            t = rng.choice(seeds)
            s = s[: rng.randrange(1, len(s))] + t[rng.randrange(len(t)) :]
        payload = bytes(s)
        for kind, mod in (("cv2", rejecting), ("pil", _Boom), ("pure", imagecodec)):
            _decode_to_array(kind, mod, payload)  # result-or-None, no raise
            _decode_to_array_deep(kind, mod, payload)


def test_netpbm_encoder_normalizes_array_input_in_byte_branch():
    """ADVICE r10 item 3: the maxval<=255 branch must serialize array
    inputs sample-per-byte (a non-uint8 numpy array passes len() but
    bytes() would emit itemsize bytes per sample — silent corruption)."""
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import encode_pgm

    ref = encode_pgm(2, 2, bytes((5, 6, 7, 8)))
    assert encode_pgm(2, 2, np.array([5, 6, 7, 8], dtype=np.int64)) == ref
    assert encode_pgm(2, 2, [5, 6, 7, 8]) == ref
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([5, 6, 7, 300]))  # sample above maxval
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([5, 6, -1, 8]))  # negative sample
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.zeros(5, np.uint8))  # size mismatch


def test_netpbm_encoder_wide_memoryview_routes_through_numpy():
    """ADVICE r11 item 1: a memoryview whose itemsize > 1 (e.g. over a
    uint16/int64 numpy array) must NOT take the raw-bytes fast path —
    len() counts elements there, so the size check passes while bytes()
    emits itemsize bytes per sample.  Wide memoryviews normalize through
    numpy and serialize one byte per sample like any array input."""
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
        decode_image,
        encode_pgm,
        encode_ppm,
    )

    ref = encode_pgm(2, 2, bytes((5, 6, 7, 8)))
    for dt in (np.uint16, np.int32, np.int64):
        mv = memoryview(np.array([5, 6, 7, 8], dtype=dt))
        assert mv.itemsize > 1 and len(mv) == 4  # the trap ADVICE describes
        assert encode_pgm(2, 2, mv) == ref
    # itemsize-1 memoryviews still take the fast path byte-for-byte
    assert encode_pgm(2, 2, memoryview(bytes((5, 6, 7, 8)))) == ref
    assert encode_pgm(2, 2, memoryview(np.array([5, 6, 7, 8], np.uint8))) == ref
    # and the widened route roundtrips through the decoder
    w, h, c, px = decode_image(encode_ppm(1, 2, memoryview(np.arange(6, dtype=np.int64))))
    assert (w, h, c, px) == (1, 2, 3, bytes(range(6)))
    # out-of-range values in a wide memoryview are rejected, not truncated
    with pytest.raises(ValueError):
        encode_pgm(2, 2, memoryview(np.array([5, 6, 7, 300], np.int64)))


def test_netpbm_encoder_rejects_non_integral_samples():
    """ADVICE r11 item 2: float inputs that do not roundtrip exactly are
    rejected, not floored — [5.7, ...] passes the 0..maxval range check
    but astype would silently shift every value.  Exactly-integral floats
    stay accepted (they roundtrip), as do NaNs -> ValueError (NaN defeats
    the min/max range check because NaN comparisons are all False)."""
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import encode_pgm

    ref = encode_pgm(2, 2, bytes((5, 6, 7, 8)))
    assert encode_pgm(2, 2, np.array([5.0, 6.0, 7.0, 8.0])) == ref  # integral floats OK
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([5.7, 6.0, 7.0, 8.0]))
    with pytest.raises(ValueError):
        encode_pgm(2, 2, [5.5, 6.5, 7.5, 8.5])
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([5.0, 6.0, 7.0, float("nan")]))
    # 2-byte branch holds the same contract
    assert encode_pgm(2, 2, np.array([300.0, 6.0, 7.0, 8.0]), maxval=4095) == encode_pgm(
        2, 2, np.array([300, 6, 7, 8]), maxval=4095
    )
    with pytest.raises(ValueError):
        encode_pgm(2, 2, np.array([300.5, 6.0, 7.0, 8.0]), maxval=4095)


# ------------------------------------------------------------- fuzzing


def test_deep_decoders_hold_the_drop_contract_under_mutation():
    """Byte-flip/truncate/splice fuzz over valid deep seeds: the deep
    twins obey the same ValueError-or-success contract as the 8-bit
    decoders (2k mutations here; the round log records the larger
    campaign)."""
    import random

    rng = random.Random(160)
    seeds = [
        encode_jpeg_extended(16, 8, _basis12(16, 8, 2), precision=12, table16=True),
        encode_jpeg_lossless(8, 8, np.arange(64, dtype=np.int64).reshape(8, 8) * 1021 % 65536, precision=16),
        encode_png(5, 7, (np.arange(105, dtype=np.uint16) * 624).astype(">u2").tobytes(), channels=3, depth=16),
        b"P5\n4 4\n65535\n" + bytes(range(32)),
    ]
    for i in range(2000):
        s = bytearray(rng.choice(seeds))
        op = i % 3
        if op == 0:
            s[rng.randrange(len(s))] = rng.randrange(256)
        elif op == 1:
            s = s[: rng.randrange(2, len(s))]
        else:
            t = rng.choice(seeds)
            s = s[: rng.randrange(2, len(s))] + t[rng.randrange(len(t)) :]
        for fn in (decode_image_deep, decode_image):
            try:
                fn(bytes(s))
            except ValueError:
                pass  # the contract: ValueError or success, nothing else


# ------------------------------------------------------ property sweeps

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 3, 4]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_deep_roundtrip_property(w, h, channels, interlace, seed):
    """PNG is lossless: ANY 16-bit raster roundtrips verbatim through the
    deep decoder, and the 8-bit contract equals the deep samples >> 8."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w, channels), dtype=np.uint16)
    payload = encode_png(
        w, h, img.astype(">u2").tobytes(), channels=channels, depth=16, interlace=interlace
    )
    dw, dh, c, depth, px = decode_png_deep(payload)
    assert (dw, dh, c, depth) == (w, h, channels, 16)
    shape = (h, w) if channels == 1 else (h, w, channels)
    got = _u16(px, shape)
    assert np.array_equal(got, img.reshape(shape))
    flat = np.frombuffer(decode_png(payload)[3], np.uint8).reshape(shape)
    assert np.array_equal(flat, (got >> 8).astype(np.uint8))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    precision=st.integers(2, 16),
    psel=st.integers(1, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_lossless_deep_roundtrip_property(w, h, precision, psel, seed):
    """Lossless JPEG under ANY predictor/precision: deep readout returns
    the encoder's samples verbatim (the H.1 process is exact)."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(0, 1 << precision, (h, w), dtype=np.int64)
    payload = encode_jpeg_lossless(w, h, samples, precision=precision, predictor=psel)
    dw, dh, c, depth, px = decode_jpeg_deep(payload)
    assert (dw, dh, c, depth) == (w, h, 1, precision)
    dt = "<u2" if precision > 8 else np.uint8
    got = np.frombuffer(px, dt).reshape(h, w)
    assert np.array_equal(got.astype(np.int64), samples)


@settings(max_examples=20, deadline=None)
@given(
    wb=st.integers(1, 3),
    hb=st.integers(1, 3),
    seed=st.integers(0, 10_000),
    restart=st.integers(0, 3),
)
def test_jpeg_12bit_deep_exact_property(wb, hb, seed, restart):
    """12-bit SOF1 over the exact-quantizing basis family at any block
    grid / restart interval: deep decode equals the source raster."""
    w, h = 8 * wb, 8 * hb
    img = _basis12(w, h, seed)
    payload = encode_jpeg_extended(
        w, h, img, precision=12, restart_interval=restart, table16=bool(seed % 2)
    )
    dw, dh, c, depth, px = decode_jpeg_deep(payload)
    assert (dw, dh, c, depth) == (w, h, 1, 12)
    assert np.array_equal(_u16(px, (h, w)), img)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    maxval=st.integers(256, 65535),
    seed=st.integers(0, 10_000),
    color=st.booleans(),
)
def test_ladder_maxval_contract_property(w, h, maxval, seed, color):
    """r11 routing sweep over the FULL 2-byte maxval range: on every rung
    a 2-byte netpbm payload reports bit_depth = maxval.bit_length() with
    verbatim samples in the deep ladder and the v >> (P-8) MSB reduction
    in the 8-bit one — rung-independent by construction."""
    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
        encode_pgm,
        encode_ppm,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
        _decode_to_array_deep,
    )

    rng = np.random.default_rng(seed)
    spp = 3 if color else 1
    img = rng.integers(0, maxval + 1, w * h * spp, dtype=np.uint16)
    enc = encode_ppm if color else encode_pgm
    payload = enc(w, h, img, maxval=maxval)
    depth = maxval.bit_length()
    shape = (h, w, 3) if color else (h, w)
    expect_deep = img.reshape(shape)
    expect_flat = np.minimum(expect_deep >> (depth - 8), 255).astype(np.uint8)
    for kind, mod in (("cv2", None), ("pil", None), ("pure", imagecodec)):
        arr, d = _decode_to_array_deep(kind, mod, payload)
        assert d == depth
        assert np.array_equal(arr, expect_deep)
        assert np.array_equal(_decode_to_array(kind, mod, payload), expect_flat)
