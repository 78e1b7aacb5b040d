"""Unit tests for the vendored pure-Python baseline JPEG codec
(operators/jpegcodec.py) — the S-08 entropy-decode slice (VERDICT r6 item 6).

The exactness family mirrors q416's fixture: rasters in the span of the DC
and (4,4) DCT basis vectors with flat-8 quantization land on exact integer
multiples of the quant step, so encode -> decode must reproduce the pixels
byte-for-byte while still exercising the full entropy pipeline (Huffman DC
diffs of both signs, ZRL + the (4,4) AC coefficient, EOB, 0xFF00 byte
stuffing, DRI/RSTn with predictor resets, partial-MCU crop).
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg_gray,
)


def _sign():
    return np.where(np.isin(np.arange(8), (0, 3, 4, 7)), 1, -1)


def _fixture(did: int) -> tuple[int, int, np.ndarray]:
    """The q416 raster family: per 8x8 block k, 128 + dc_k + ac_k*s(x)s(y)."""
    sgn = _sign()
    wb, hb = did % 4 + 1, did % 3 + 1
    w, h = 8 * wb, 8 * hb
    ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
    k = ky * wb + kx
    dc = (7 * did + 5 * k) % 33 - 16
    ac = (3 * did + k) % 17 - 8
    img = 128 + dc + ac * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
    return w, h, img.astype(np.uint8)


@pytest.mark.parametrize("did", [0, 1, 2, 3, 5, 7, 11, 17, 23, 59, 118])
def test_exact_roundtrip_basis_family(did):
    w, h, img = _fixture(did)
    payload = encode_jpeg_gray(w, h, img.tobytes())
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


@pytest.mark.parametrize("did", [0, 2, 4, 6, 22, 118])
def test_exact_roundtrip_with_restart_markers(did):
    w, h, img = _fixture(did)
    plain = encode_jpeg_gray(w, h, img.tobytes())
    rst = encode_jpeg_gray(w, h, img.tobytes(), restart_interval=w // 8)
    assert rst != plain, "DRI must change the bitstream"
    for payload in (plain, rst):
        dw, dh, _, px = decode_jpeg(payload)
        assert (dw, dh) == (w, h)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


def test_byte_stuffing_is_present_and_undone():
    """At least one fixture stream contains a stuffed 0xFF00 inside the
    entropy-coded segment (the corpus sweep found many; pin one) and
    decoding it is still exact."""
    found = None
    for did in range(60):
        w, h, img = _fixture(did)
        payload = encode_jpeg_gray(w, h, img.tobytes())
        scan = payload[payload.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan[:-2]:
            found = (did, w, h, img, payload)
            break
    assert found is not None, "no fixture stream exercised byte stuffing"
    did, w, h, img, payload = found
    _, _, _, px = decode_jpeg(payload)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


@pytest.mark.parametrize(
    "w,h,val", [(13, 7, 200), (1, 1, 0), (17, 23, 255), (9, 16, 77), (8, 8, 128)]
)
def test_partial_mcu_crop_constant_images(w, h, val):
    """Non-multiple-of-8 dims: edge-replicated pad keeps blocks constant, so
    the roundtrip stays exact and the decoder must crop back to (w, h)."""
    img = np.full((h, w), val, np.uint8)
    dw, dh, _, px = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
    assert (dw, dh) == (w, h)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


def test_lossy_roundtrip_error_bounded_by_quantization():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32), np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg_gray(32, 24, img.tobytes()))
    err = np.abs(np.frombuffer(px, np.uint8).reshape(24, 32).astype(int) - img.astype(int))
    # flat-8 quantization: coefficient error <= 4 per coefficient; the
    # empirical max on this seed is 8 — the bound below is loose but real:
    # a Huffman/zigzag/EXTEND bug produces errors in the hundreds
    assert err.max() <= 32


def test_decode_rejects_what_it_does_not_claim():
    w, h, img = _fixture(3)
    payload = bytearray(encode_jpeg_gray(w, h, img.tobytes()))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")  # not a JPEG at all
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload[:40]))  # truncated mid-headers
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)  # claim progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))


def test_decode_image_dispatches_jpeg_magic():
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import decode_image
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_lossless,
    )

    w, h, img = _fixture(9)
    dw, dh, c, px = decode_image(encode_jpeg_gray(w, h, img.tobytes()))
    assert (dw, dh, c) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)
    # lossless (SOF3) shares the 0xFFD8 magic — the ladder reaches it too
    assert decode_image(encode_jpeg_lossless(w, h, img.tobytes())) == (
        w, h, 1, img.tobytes()
    )


def test_bmp_data_offset_inside_headers_rejected():
    """ADVICE r6 item 4: a crafted BMP whose data offset points back into
    the headers must raise, not decode header bytes as pixels."""
    import struct

    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
        decode_image,
        encode_bmp24,
    )

    good = bytearray(encode_bmp24(2, 2, bytes(12)))
    struct.pack_into("<I", good, 10, 20)  # data_offset 54 -> 20 (inside DIB)
    with pytest.raises(ValueError):
        decode_image(bytes(good))


def test_interop_with_pillow_when_available():
    """Env-gated: when Pillow exists, it must decode our streams to the same
    pixels up to the T.81 IDCT tolerance (+-1)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    w, h, img = _fixture(5)
    payload = encode_jpeg_gray(w, h, img.tobytes())
    theirs = np.asarray(PIL.open(io.BytesIO(payload)))
    assert theirs.shape == (h, w)
    assert np.abs(theirs.astype(int) - img.astype(int)).max() <= 1


# --- property tests (hypothesis) -------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    wb=st.integers(1, 4),
    hb=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    ri=st.integers(0, 3),
)
def test_property_exact_roundtrip_random_basis_blocks(wb, hb, seed, ri):
    """ANY raster whose blocks lie in span{DC, (4,4)} with coefficients on
    the flat-8 quant lattice roundtrips exactly — per-block dc/ac drawn
    randomly, restart interval 0-3 MCUs."""
    rng = np.random.default_rng(seed)
    sgn = _sign()
    w, h = 8 * wb, 8 * hb
    dc = rng.integers(-100, 101, (hb, wb))
    ac = rng.integers(-27, 28, (hb, wb))
    img = (
        128
        + np.kron(dc, np.ones((8, 8), np.int64))
        + np.kron(ac, np.outer(sgn, sgn))
    )
    img = np.clip(img, 0, 255)
    # clipping can push a block off the two-basis span; rebuild from the
    # clipped values only when no clipping happened (hypothesis shrinks
    # toward small dc/ac where this always holds)
    raw = 128 + np.kron(dc, np.ones((8, 8), np.int64)) + np.kron(ac, np.outer(sgn, sgn))
    if not np.array_equal(img, raw):
        img = 128 + np.kron(np.clip(dc, -60, 60), np.ones((8, 8), np.int64)) + np.kron(
            np.clip(ac, -8, 8), np.outer(sgn, sgn)
        )
    img = img.astype(np.uint8)
    payload = encode_jpeg_gray(w, h, img.tobytes(), restart_interval=ri)
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_property_decoder_never_crashes_on_garbage(data):
    """Arbitrary bytes after an SOI marker must either decode or raise
    ValueError — never IndexError/struct.error/infinite loop (the drop-
    don't-kill contract the mapInPandas kernels rely on)."""
    try:
        decode_jpeg(b"\xff\xd8" + data)
    except ValueError:
        pass


# --- color (multi-component) decode ----------------------------------------

from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import encode_jpeg_color


def _color_fixture(did: int):
    """The q418 plane family: Y in the DC+(4,4) span, DC-only chroma."""
    sgn = _sign()

    def basis_plane(w, h, dcf, acf):
        ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
        k = ky * (w // 8) + kx
        return (
            128 + dcf(k) + acf(k) * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
        ).astype(np.uint8)

    w, h = 16 * (did % 2 + 1), 16 * (did % 3 + 1)
    sub = "420" if did % 2 == 0 else "444"
    cw, chh = (w // 2, h // 2) if sub == "420" else (w, h)
    y = basis_plane(w, h, lambda k: (7 * did + 5 * k) % 33 - 16,
                    lambda k: (3 * did + k) % 17 - 8)
    cb = basis_plane(cw, chh, lambda k: (5 * did + 3 * k) % 25 - 12, lambda k: 0 * k)
    cr = basis_plane(cw, chh, lambda k: (11 * did + 7 * k) % 21 - 10, lambda k: 0 * k)
    return w, h, sub, y, cb, cr


def _expected_rgb(y, cb, cr):
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = np.floor(yf + 1.402 * crf + 0.5)
    g = np.floor(yf - 0.344136 * cbf - 0.714136 * crf + 0.5)
    b = np.floor(yf + 1.772 * cbf + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("did", [0, 1, 2, 3, 4, 5, 10, 11, 35])
def test_color_roundtrip_exact_both_subsamplings(did):
    w, h, sub, y, cb, cr = _color_fixture(did)
    ri = (w // (16 if sub == "420" else 8)) if did % 5 == 0 else 0
    payload = encode_jpeg_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), subsample=sub, restart_interval=ri
    )
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    if sub == "420":
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    exp = _expected_rgb(y, cb, cr)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)


def test_color_rejects_unsupported_sampling():
    """Header-level sampling gates: factors outside 1-4 and more than 10
    data units per MCU (T.81 B.2.3) must reject at the SOF parse.
    (Non-integral ratios like Y 3x1 / Cb 2x1 DECODE since r9 — see
    test_color_roundtrip_exact_fractional_samplings.)"""
    w, h, sub, y, cb, cr = _color_fixture(1)  # 444 stream
    payload = bytearray(
        encode_jpeg_color(w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), subsample=sub)
    )
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 11] == 0x11  # Y sampling byte in SOF0
    for samp_byte in (0x51, 0x15, 0x01, 0x10):  # factor 5 / factor 0
        payload[sof + 11] = samp_byte
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))
    payload[sof + 11] = 0x43  # Y alone is 12 data units per MCU
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    # the encoder enforces the same legality gates
    with pytest.raises(ValueError):
        encode_jpeg_color(8, 8, bytes(64), bytes(64), bytes(64),
                          factors=((5, 1), (1, 1), (1, 1)))
    with pytest.raises(ValueError):
        encode_jpeg_color(8, 8, bytes(64), bytes(16), bytes(16),
                          factors=((4, 3), (1, 1), (1, 1)))


def _general_planes(w, h, samp, did=7):
    """Basis-family planes (exact under flat-8 quantization) for arbitrary
    per-component sampling factors; plane dims per T.81 A.1.1."""
    sgn = _sign()

    def basis_plane(pw, ph, dcf, acf):
        ky, kx = np.meshgrid(np.arange(ph) // 8, np.arange(pw) // 8, indexing="ij")
        k = ky * (pw // 8) + kx
        return (
            128 + dcf(k) + acf(k) * np.outer(sgn[np.arange(ph) % 8], sgn[np.arange(pw) % 8])
        ).astype(np.uint8)

    hmax = max(ch for ch, _ in samp)
    vmax = max(cv for _, cv in samp)
    coefs = [
        (lambda k, o=o: (7 * did + 5 * k + o) % 33 - 16,
         (lambda k: (3 * did + k) % 17 - 8) if o == 0 else (lambda k: 0 * k))
        for o in (0, 3, 9)
    ]
    planes = []
    for (ch, cv), (dcf, acf) in zip(samp, coefs):
        pw, ph = w * ch // hmax, h * cv // vmax  # w, h chosen divisible
        assert pw % 8 == 0 and ph % 8 == 0, "fixture dims must be block-aligned"
        planes.append(basis_plane(pw, ph, dcf, acf))
    return planes


@pytest.mark.parametrize(
    "samp",
    [
        ((4, 1), (1, 1), (1, 1)),  # 4:1:1 — the DV/camera sampling
        ((2, 4), (1, 1), (1, 1)),
        ((2, 2), (2, 1), (1, 1)),  # mixed per-component grid
        ((2, 2), (2, 1), (1, 2)),
        ((4, 1), (4, 1), (1, 1)),
    ],
)
def test_color_roundtrip_exact_generalized_samplings(samp):
    """The MCU loop and replication upsampler are generic over ANY
    T.81-legal factor set with integral ratios — 4:1:1 and mixed
    per-component grids roundtrip exactly on the basis-plane family, and
    the progressive encoder produces bit-identical pixels."""
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_progressive_color,
    )

    w, h = 32, 32
    hmax = max(ch for ch, _ in samp)
    vmax = max(cv for _, cv in samp)
    y, cb, cr = _general_planes(w, h, samp)
    payload = encode_jpeg_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), factors=samp, restart_interval=3
    )
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    ups = [
        np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        for p, (ch, cv) in zip((y, cb, cr), samp)
    ]
    exp = _expected_rgb(*ups)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)
    prog = encode_jpeg_progressive_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), factors=samp
    )
    assert decode_jpeg(prog)[3] == px, "progressive must match baseline bit-exactly"


@pytest.mark.parametrize(
    ("samp", "w", "h"),
    [
        (((3, 1), (2, 1), (1, 1)), 48, 32),  # the ADVICE-era example grid
        (((3, 2), (2, 1), (1, 1)), 48, 32),
        (((3, 1), (1, 1), (2, 1)), 48, 16),
        (((4, 1), (3, 1), (1, 1)), 96, 16),
    ],
)
def test_color_roundtrip_exact_fractional_samplings(samp, w, h):
    """Fractional ratios to (hmax, vmax) — e.g. Y 3x1 with Cb 2x1 —
    decode since r9 via nearest-neighbor upsampling (output pixel (Y, X)
    reads component sample (Y*cv//vmax, X*ch//hmax)); exact on the
    basis-plane family, and progressive stays bit-identical to baseline.
    Fixture dims keep every A.1.1 plane block-aligned so quantization is
    exact."""
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_progressive_color,
    )

    hmax = max(ch for ch, _ in samp)
    vmax = max(cv for _, cv in samp)
    assert any(hmax % ch or vmax % cv for ch, cv in samp), "fixture must be fractional"
    y, cb, cr = _general_planes(w, h, samp)
    payload = encode_jpeg_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), factors=samp, restart_interval=2
    )
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    rows = lambda cv: (np.arange(h) * cv) // vmax  # noqa: E731
    cols = lambda ch: (np.arange(w) * ch) // hmax  # noqa: E731
    ups = [
        p[np.ix_(rows(cv), cols(ch))] for p, (ch, cv) in zip((y, cb, cr), samp)
    ]
    exp = _expected_rgb(*ups)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)
    prog = encode_jpeg_progressive_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), factors=samp
    )
    assert decode_jpeg(prog)[3] == px, "progressive must match baseline bit-exactly"


def test_fractional_sampling_partial_mcu_crop():
    """Fractional grids with non-MCU-aligned dims: flat planes quantize
    exactly for ANY dimensions (edge padding preserves flatness), so the
    decode must be the flat color everywhere — pins the A.1.1 ceil plane
    dims and the right/bottom crop under fractional upsampling."""
    samp = ((3, 1), (2, 1), (1, 1))
    w, h = 37, 11  # mcux=2 (48-wide grid), crop 11 columns; Cb true width ceil(37*2/3)=25
    hmax = 3
    y = np.full((h, w), 120, np.uint8)
    cb = np.full((h, -(-w * 2 // hmax)), 130, np.uint8)
    cr = np.full((h, -(-w * 1 // hmax)), 140, np.uint8)
    payload = encode_jpeg_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), factors=samp
    )
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    exp = _expected_rgb(
        y, np.full((h, w), 130, np.uint8), np.full((h, w), 140, np.uint8)
    )
    assert np.array_equal(got, exp)


def test_color_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    w, h, sub, y, cb, cr = _color_fixture(2)  # 420
    payload = encode_jpeg_color(w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), subsample=sub)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGB"))
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    ours = _expected_rgb(y, cbu, cru)
    # libjpeg's fixed-point IDCT + fancy upsampling differ within tolerance
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 3


@pytest.mark.parametrize("sub,fh,fv", [("444", 1, 1), ("420", 2, 2), ("422", 2, 1), ("440", 1, 2)])
def test_color_roundtrip_exact_all_four_samplings(sub, fh, fv):
    """The MCU loop and replication upsampler are generic over Y sampling
    factors in {1,2}^2: all four common subsamplings roundtrip exactly on
    the basis-plane family."""
    did = 7
    sgn = _sign()

    def basis_plane(w, h, dcf, acf):
        ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
        k = ky * (w // 8) + kx
        return (
            128 + dcf(k) + acf(k) * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
        ).astype(np.uint8)

    w, h = 32, 16
    cw, chh = w // fh, h // fv
    y = basis_plane(w, h, lambda k: (7 * did + 5 * k) % 33 - 16,
                    lambda k: (3 * did + k) % 17 - 8)
    cb = basis_plane(cw, chh, lambda k: (5 * did + 3 * k) % 25 - 12, lambda k: 0 * k)
    cr = basis_plane(cw, chh, lambda k: (11 * did + 7 * k) % 21 - 10, lambda k: 0 * k)
    payload = encode_jpeg_color(
        w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), subsample=sub, restart_interval=2
    )
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    cbu = np.repeat(np.repeat(cb, fv, axis=0), fh, axis=1)
    cru = np.repeat(np.repeat(cr, fv, axis=0), fh, axis=1)
    exp = _expected_rgb(y, cbu, cru)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)


def test_malformed_headers_raise_valueerror_not_struct_errors():
    """Crafted segment bodies (short IHDR-like SOF, truncated SOS, short
    DQT) must surface as ValueError, never IndexError/struct.error — the
    mapInPandas drop contract catches only ValueError."""
    w, h, img = _fixture(3)
    good = encode_jpeg_gray(w, h, img.tobytes())
    sos = good.index(b"\xff\xda")
    # truncate inside the SOS header (component list cut off)
    with pytest.raises(ValueError):
        decode_jpeg(good[: sos + 5])
    # shrink the SOF0 segment length so the component bytes fall outside it
    sof = good.index(b"\xff\xc0")
    short = bytearray(good)
    short[sof + 2 : sof + 4] = (0).to_bytes(1, "big") + (4).to_bytes(1, "big")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(short))


def test_oversubscribed_dht_rejected():
    """A DHT whose BITS over-subscribe the canonical code space (e.g. three
    1-bit codes) must raise ValueError at header parse, not silently build
    a partial 16-bit prefix table (ADVICE r7 item 1)."""
    w, h, img = _fixture(3)
    good = bytearray(encode_jpeg_gray(w, h, img.tobytes()))
    dht = good.index(b"\xff\xc4")
    # bits[1] lives at segment body offset 1 (after the class/id byte);
    # segment starts at dht+4 (marker + 2-byte length).  Force 3 codes of
    # length 1: code space for length 1 holds only 2.
    bits_off = dht + 4 + 1
    n_old = sum(good[bits_off : bits_off + 16])
    good[bits_off] = 3
    good[bits_off + 1 : bits_off + 16] = bytes(15)
    # keep the value list length consistent with the new BITS sum
    seg_len = int.from_bytes(good[dht + 2 : dht + 4], "big")
    vals_off = bits_off + 16
    new_seg = good[: vals_off + 3] + good[vals_off + n_old :]
    new_seg[dht + 2 : dht + 4] = (seg_len - n_old + 3).to_bytes(2, "big")
    with pytest.raises(ValueError, match="over-subscribed"):
        decode_jpeg(bytes(new_seg))


def test_dc_category_above_15_rejected():
    """A class-0 DHT declaring a HUFFVAL above 15 is illegal (T.81 table
    B.5: DC symbols are magnitude categories 0-15). Found by fuzzing: such
    a table made the decoder read absurd bit counts and grow the DC
    predictor past int64 — an OverflowError escaping the ValueError drop
    contract. Must reject at header parse."""
    w, h, img = _fixture(4)
    good = bytearray(encode_jpeg_gray(w, h, img.tobytes()))
    dht = good.index(b"\xff\xc4")
    assert good[dht + 4] == 0x00  # first table is class 0 (DC)
    vals_off = dht + 4 + 17  # class/id byte + 16 BITS bytes
    good[vals_off] = 0x20  # first DC category -> 32
    with pytest.raises(ValueError, match="DC category"):
        decode_jpeg(bytes(good))


def test_huge_sof_dimensions_rejected_before_allocation():
    """A crafted SOF declaring 60000x60000 would allocate a ~34 GB
    coefficient store before any entropy data is read; the 2^30-BYTE
    decoded-size cap (width*height*components — cv2's
    CV_IO_MAX_IMAGE_PIXELS default for greyscale, 3x tighter for color,
    ADVICE r8 discipline) rejects it at the header."""
    import struct as _s

    w, h, img = _fixture(6)
    good = bytearray(encode_jpeg_gray(w, h, img.tobytes()))
    sof = good.index(b"\xff\xc0")
    _s.pack_into(">HH", good, sof + 5, 60000, 60000)
    with pytest.raises(ValueError, match="2\\^30-byte"):
        decode_jpeg(bytes(good))
    # channel-aware: a 3-component frame at 20000x20000 is only 4e8 pixels
    # (under the old channel-blind pixel cap) but 1.2e9 decoded bytes —
    # must reject too
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_color,
    )

    plane = bytes(64)
    good = bytearray(encode_jpeg_color(8, 8, plane, plane, plane, "444"))
    sof = good.index(b"\xff\xc0")
    _s.pack_into(">HH", good, sof + 5, 20000, 20000)
    with pytest.raises(ValueError, match="2\\^30-byte"):
        decode_jpeg(bytes(good))


def test_fill_bytes_and_standalone_markers_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code, and TEM (0x01) is a standalone parameterless marker — both legal
    encoder outputs must decode identically (ADVICE r7 item 2)."""
    w, h, img = _fixture(5)
    good = encode_jpeg_gray(w, h, img.tobytes())
    ref = decode_jpeg(good)
    sof = good.index(b"\xff\xc0")
    padded = good[:sof] + b"\xff\xff\xff" + b"\xff\x01" + good[sof:]
    assert decode_jpeg(padded) == ref
    # a stuffed 0xFF00 outside the scan is NOT a marker: still rejected
    with pytest.raises(ValueError):
        decode_jpeg(good[:sof] + b"\xff\x00" + good[sof:])


@pytest.mark.parametrize("w,h,sub,fh,fv", [
    (13, 7, "420", 2, 2), (17, 9, "444", 1, 1), (10, 6, "422", 2, 1), (9, 11, "440", 1, 2),
])
def test_color_partial_mcu_crop_constant(w, h, sub, fh, fv):
    """Non-multiple-of-MCU color dims: Y and chroma planes edge-replicate to
    the MCU grid on encode and crop back on decode; constant planes keep
    every block constant so the roundtrip stays exact through the color
    transform."""
    cw, chh = (w + fh - 1) // fh, (h + fv - 1) // fv
    y = np.full((h, w), 90, np.uint8)
    cb = np.full((chh, cw), 120, np.uint8)
    cr = np.full((chh, cw), 150, np.uint8)
    payload = encode_jpeg_color(w, h, y.tobytes(), cb.tobytes(), cr.tobytes(), subsample=sub)
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    exp = _expected_rgb(
        y,
        np.repeat(np.repeat(cb, fv, axis=0), fh, axis=1)[:h, :w],
        np.repeat(np.repeat(cr, fv, axis=0), fh, axis=1)[:h, :w],
    )
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)


# --- lossless (SOF3, T.81 Annex H) ------------------------------------------


def _ll():
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_lossless,
    )

    return encode_jpeg_lossless


@pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_roundtrip_exact_every_predictor(pred):
    """Annex-H lossless is exact BY CONSTRUCTION at 8-bit: encode->decode
    must reproduce the source bytes bit-for-bit under every spec
    predictor (H.1.2.1), greyscale and 3-component."""
    rng = np.random.default_rng(pred)
    img = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    payload = _ll()(9, 6, img.tobytes(), predictor=pred)
    assert decode_jpeg(payload) == (9, 6, 1, img.tobytes())
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    payload = _ll()(7, 5, [rgb[:, :, i].tobytes() for i in range(3)], predictor=pred)
    dw, dh, dc, px = decode_jpeg(payload)
    assert (dw, dh, dc) == (7, 5, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(5, 7, 3), rgb)


def test_lossless_deep_precision_msb_contract():
    """P > 8 reduces to the most significant 8 bits (v >> (P-8)) — the same
    output contract as 16-bit PNG (r9); low-byte-only differences are
    invisible, pinning the reduction direction."""
    rng = np.random.default_rng(42)
    for P in (12, 16):
        deep = rng.integers(0, 1 << P, (4, 5), dtype=np.int64)
        payload = _ll()(5, 4, deep, precision=P, predictor=4)
        dw, dh, dc, px = decode_jpeg(payload)
        assert (dw, dh, dc) == (5, 4, 1)
        assert np.array_equal(
            np.frombuffer(px, np.uint8).reshape(4, 5), (deep >> (P - 8)).astype(np.uint8)
        )
    hi = np.full((3, 4), 0xAB00, np.int64)
    a = decode_jpeg(_ll()(4, 3, hi, precision=16))
    b = decode_jpeg(_ll()(4, 3, hi | 0xCD, precision=16))
    assert a == b and a[3][0] == 0xAB


def test_lossless_mod_2_16_wraparound():
    """Differences are carried modulo 2^16 (H.1.2.2), including the SSSS=16
    no-appended-bits case for diff 32768 — hostile gradients at 16-bit
    roundtrip exactly under every predictor."""
    hostile = np.zeros((3, 5), np.int64)
    hostile[1, :] = 65535
    hostile[2, ::2] = 32768
    for pred in range(1, 8):
        payload = _ll()(5, 3, hostile, precision=16, predictor=pred)
        got = np.frombuffer(decode_jpeg(payload)[3], np.uint8).reshape(3, 5)
        assert np.array_equal(got, (hostile >> 8).astype(np.uint8)), f"pred {pred}"


def test_lossless_point_transform():
    """Samples are encoded pre-divided by 2^Pt and the decoder scales back
    (H.1): a Pt=2 stream reproduces source << 2."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 64, (3, 4), dtype=np.int64)
    payload = _ll()(4, 3, src, precision=8, predictor=7, point_transform=2)
    got = np.frombuffer(decode_jpeg(payload)[3], np.uint8).reshape(3, 4)
    assert np.array_equal(got, (src << 2).astype(np.uint8))


def test_lossless_rejects():
    """Header gates: predictor/Pt/precision out of range, subsampled
    lossless components, restart intervals, lossless SSSS above 16, and
    mixed frame types all reject as ValueError."""
    import struct as _s

    enc = _ll()
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    good = enc(4, 3, img.tobytes())
    # encoder-side gates
    for kw in (
        {"predictor": 0}, {"predictor": 8},
        {"precision": 1}, {"precision": 17},
        {"point_transform": 8},
    ):
        with pytest.raises(ValueError):
            enc(4, 3, img.tobytes(), **kw)
    with pytest.raises(ValueError):
        enc(4, 3, np.full((3, 4), 256, np.int64))  # sample over 2^8
    # decoder-side: predictor Ss out of range (splice SOS Ss byte)
    sos = good.index(b"\xff\xda")
    bad = bytearray(good)
    bad[sos + 2 + 2 + 1 + 2] = 0  # Ss == 0 only legal in differential frames
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # subsampled lossless component
    sof = good.index(b"\xff\xc3")
    bad = bytearray(good)
    bad[sof + 11] = 0x21
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # nonzero DRI before the scan
    dri = b"\xff\xdd" + _s.pack(">HH", 4, 2)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(good[:sof] + dri + good[sof:])
    # zero DRI is a no-op, still decodes
    dri0 = b"\xff\xdd" + _s.pack(">HH", 4, 0)
    assert decode_jpeg(good[:sof] + dri0 + good[sof:])[3] == img.tobytes()
    # SSSS above 16 in a lossless DC table
    dht = good.index(b"\xff\xc4")
    bad = bytearray(good)
    bad[dht + 5 + 16 + 16] = 17  # last HUFFVAL (SSSS 16) -> 17
    with pytest.raises(ValueError, match="SSSS"):
        decode_jpeg(bytes(bad))
    # a second (DCT) frame header after SOF3 is malformed
    sof0 = b"\xff\xc0" + _s.pack(">HBHHB", 11, 8, 3, 4, 1) + bytes((1, 0x11, 0))
    with pytest.raises(ValueError):
        decode_jpeg(good[:sos] + sof0 + good[sos:])


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    pred=st.integers(1, 7),
    prec=st.sampled_from([8, 12, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_lossless_roundtrip(w, h, pred, prec, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << prec, (h, w), dtype=np.int64)
    payload = _ll()(w, h, img, precision=prec, predictor=pred)
    dw, dh, dc, px = decode_jpeg(payload)
    exp = (img >> (prec - 8)).astype(np.uint8) if prec > 8 else img.astype(np.uint8)
    assert (dw, dh, dc) == (w, h, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), exp)


# --- extended sequential (SOF1, 12-bit) --------------------------------------


def _ext():
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_extended,
    )

    return encode_jpeg_extended


def _basis12(w, h, seed=0):
    """12-bit basis-family raster (span{DC, (4,4)}), exact under flat-8."""
    sgn = _sign()
    wb, hb = w // 8, h // 8
    ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
    k = ky * wb + kx
    dc = (35 * k + 7 * seed) % 1601 - 800
    ac = (17 * k + 3 * seed) % 801 - 400
    img = 2048 + dc + ac * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
    assert img.min() >= 0 and img.max() < 4096
    return img


@pytest.mark.parametrize("seed", [0, 5, 11])
def test_extended_12bit_gray_exact_msb(seed):
    """12-bit SOF1 greyscale: the basis family quantizes exactly, so the
    decoded 12-bit plane equals the source and the uint8 output is its
    most significant 8 bits (the shared deep-sample contract)."""
    w, h = 24, 16
    img = _basis12(w, h, seed)
    payload = _ext()(w, h, img, precision=12, restart_interval=seed % 3)
    dw, dh, dc, px = decode_jpeg(payload)
    assert (dw, dh, dc) == (w, h, 1)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w), (img >> 4).astype(np.uint8)
    )


def test_extended_12bit_pq1_table_equivalent():
    """The SAME quant table stored as Pq=0 (8-bit entries) and Pq=1
    (16-bit entries) must decode identically — pins the 16-bit DQT walk."""
    w, h = 16, 8
    img = _basis12(w, h, 2)
    a = decode_jpeg(_ext()(w, h, img, precision=12))
    b = decode_jpeg(_ext()(w, h, img, precision=12, table16=True))
    assert a == b


def test_extended_12bit_color_exact():
    """12-bit 4:4:4 color: exact 12-bit planes reduce to MSB, then the
    certified 8-bit JFIF transform — expected pixels are closed-form."""
    w, h = 16, 16
    y12 = _basis12(w, h, 1)
    cb12 = np.clip(y12 // 2 + 1024, 0, 4095)
    cr12 = np.clip(4095 - y12, 0, 4095)
    payload = _ext()(w, h, [y12, cb12, cr12], precision=12)
    dw, dh, c, px = decode_jpeg(payload)
    assert (dw, dh, c) == (w, h, 3)
    exp = _expected_rgb(
        (y12 >> 4).astype(np.uint8),
        (cb12 >> 4).astype(np.uint8),
        (cr12 >> 4).astype(np.uint8),
    )
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), exp)


def test_extended_8bit_sof1_matches_baseline_pixels():
    """An 8-bit SOF1 stream decodes through the same pipeline as SOF0 —
    same quant table and coefficients mean identical pixels."""
    w, h, img = _fixture(7)
    ext = decode_jpeg(_ext()(w, h, img.astype(np.int64), precision=8))
    base = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
    assert ext == base


def test_extended_rejects():
    import struct as _s

    img = _basis12(8, 8)
    # Pq=1 with an 8-bit frame (encoder and decoder sides, B.4.4.1)
    with pytest.raises(ValueError):
        _ext()(8, 8, (img >> 4), precision=8, table16=True)
    good = _ext()(8, 8, img, precision=12, table16=True)
    sof = good.index(b"\xff\xc1")
    bad = bytearray(good)
    bad[sof + 4] = 8  # claim 8-bit precision over the Pq=1 table
    with pytest.raises(ValueError, match="16-bit quant"):
        decode_jpeg(bytes(bad))
    # SOF1 precision outside {8, 12}
    bad = bytearray(good)
    bad[sof + 4] = 10
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # relabeling the frame progressive leaves an illegal scan script (a
    # full-band Ss=0/Se=63 scan is sequential-only) — still rejects, even
    # though 12-bit SOF2 itself is legal since r9
    bad = bytearray(good)
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))
    # out-of-range sample at encode
    with pytest.raises(ValueError):
        _ext()(8, 8, np.full((8, 8), 4096, np.int64), precision=12)


def _dqt_segment(pq: int, tq: int, value: int = 1) -> bytes:
    """A standalone DQT marker segment with 64 constant entries."""
    import struct as _s

    entries = (
        _s.pack(">64H", *([value] * 64)) if pq else bytes([value] * 64)
    )
    return b"\xff\xdb" + _s.pack(">HB", 2 + 1 + len(entries), (pq << 4) | tq) + entries


def test_pq1_redefined_pq0_before_8bit_sof_still_rejects():
    """B.4.4.1 is a STREAM-level rule: a Pq=1 definition in an 8-bit stream
    is illegal even when a later DQT redefines the same table id Pq=0 before
    the frame header — the final-table-state check alone would be evaded
    (ADVICE r9). Enforced by the SOF-time re-validation."""
    w, h, img = _fixture(3)
    good = encode_jpeg_gray(w, h, img.tobytes())
    assert decode_jpeg(good)  # the untampered stream decodes
    # SOI, [Pq=1 id0], then the original stream's own Pq=0 id0 DQT + SOF0
    bad = good[:2] + _dqt_segment(pq=1, tq=0) + good[2:]
    with pytest.raises(ValueError, match="16-bit quant"):
        decode_jpeg(bad)


def test_pq1_after_8bit_sof_rejects_at_definition():
    """A Pq=1 DQT AFTER the 8-bit frame header raises at definition time,
    even when immediately redefined Pq=0 (ADVICE r9)."""
    import struct as _s

    w, h, img = _fixture(4)
    good = encode_jpeg_gray(w, h, img.tobytes())
    sof = good.index(b"\xff\xc0")
    seglen = _s.unpack_from(">H", good, sof + 2)[0]
    cut = sof + 2 + seglen
    bad = good[:cut] + _dqt_segment(pq=1, tq=0) + _dqt_segment(pq=0, tq=0) + good[cut:]
    with pytest.raises(ValueError, match="16-bit quant"):
        decode_jpeg(bad)


def test_pq1_redefined_pq0_in_12bit_stream_uses_final_table():
    """The never-cleared qt16 tracking must NOT reject 12-bit streams: a
    Pq=1 table redefined Pq=0 before the 12-bit frame decodes with the
    final (8-bit-entry) table, identical to the stream without the stale
    Pq=1 definition."""
    img = _basis12(16, 8, 6)
    good = _ext()(16, 8, img, precision=12)
    redef = good[:2] + _dqt_segment(pq=1, tq=0, value=7) + good[2:]
    assert decode_jpeg(redef) == decode_jpeg(good)


def test_progressive_12bit_matches_extended_sequential():
    """12-bit PROGRESSIVE (SOF2): a complete scan script reconstructs the
    exact extended-sequential coefficients, so the decode — including the
    MSB deep-sample reduction — is bit-identical, with and without
    restart markers (the q419 exactness argument at 12 bits)."""
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_progressive_gray,
    )

    img = _basis12(24, 16, 3)
    seq = decode_jpeg(_ext()(24, 16, img, precision=12))
    prog = decode_jpeg(encode_jpeg_progressive_gray(24, 16, img, precision=12))
    assert prog == seq
    rst = decode_jpeg(
        encode_jpeg_progressive_gray(24, 16, img, precision=12, restart_interval=2)
    )
    assert rst == seq
    assert seq[3] == (img >> 4).astype(np.uint8).tobytes()
    with pytest.raises(ValueError):
        encode_jpeg_progressive_gray(24, 16, img, precision=10)


@settings(max_examples=20, deadline=None)
@given(
    wb=st.integers(1, 3),
    hb=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_extended_12bit_roundtrip(wb, hb, seed):
    img = _basis12(8 * wb, 8 * hb, seed % 997)
    dw, dh, dc, px = decode_jpeg(_ext()(8 * wb, 8 * hb, img, precision=12))
    assert (dw, dh, dc) == (8 * wb, 8 * hb, 1)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(8 * hb, 8 * wb),
        (img >> 4).astype(np.uint8),
    )
