"""Unit + property tests for the vendored pure-Python PNG codec
(operators/pngcodec.py) — the PNG half of the S-08 entropy-decode slice.

PNG is lossless, so the contract is byte-exact roundtrip for EVERY valid
image, across all five scanline filter types, all five supported color
types (grey incl. 1/2/4-bit, RGB, paletted incl. tRNS alpha, grey+alpha
normalized to RGBA, RGBA), in BOTH interlace methods (sequential and
Adam7) — plus hard rejects for everything outside the declared subset
(16-bit samples, corrupt CRCs, truncation, illegal PLTE/tRNS shapes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_exact_roundtrip_each_filter_type(channels, f):
    rng = np.random.default_rng(f * 10 + channels)
    w, h = 17, 9
    img = rng.integers(0, 256, (h, w * channels), np.uint8)
    payload = encode_png(w, h, img.tobytes(), channels=channels, filters=[f] * h)
    dw, dh, dc, px = decode_png(payload)
    assert (dw, dh, dc) == (w, h, channels)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w * channels), img)


def test_mixed_filters_per_row():
    rng = np.random.default_rng(42)
    w, h, c = 23, 10, 3
    img = rng.integers(0, 256, (h, w * c), np.uint8)
    payload = encode_png(w, h, img.tobytes(), channels=c, filters=[y % 5 for y in range(h)])
    _, _, _, px = decode_png(payload)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w * c), img)


def test_one_pixel_image_and_single_column():
    for w, h, c in [(1, 1, 1), (1, 1, 4), (1, 7, 3), (9, 1, 1)]:
        img = np.arange(w * h * c, dtype=np.uint8)
        _, _, _, px = decode_png(encode_png(w, h, img.tobytes(), channels=c,
                                            filters=[4] * h))
        assert np.array_equal(np.frombuffer(px, np.uint8), img)


def test_crc_corruption_rejected():
    payload = bytearray(encode_png(4, 4, bytes(48), channels=3))
    payload[20] ^= 0xFF  # flip a bit inside IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_rejects_outside_declared_subset():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x00")  # bad signature
    good = encode_png(4, 4, bytes(48), channels=3)
    with pytest.raises(ValueError):
        decode_png(good[:30])  # truncated
    # rewrite IHDR to claim Adam7 interlace (and fix its CRC): the IDAT
    # still holds the SEQUENTIAL scanline layout, whose byte count cannot
    # match the Adam7 pass layout for 4x4 RGB — must reject as malformed
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    adam7 = (
        good[:8]
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError):
        decode_png(adam7)
    # interlace method outside {0, 1} is rejected at the header
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2)
    meth2 = (
        good[:8]
        + struct.pack(">I", len(ihdr2))
        + b"IHDR"
        + ihdr2
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr2) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError):
        decode_png(meth2)
    # a 16-bit IHDR spliced over 8-bit scanline data: 16-bit itself now
    # decodes (see test_16bit_*), but the byte count cannot match — the
    # scanline-size check must reject this as malformed, not misdecode
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    deep = (
        good[:8]
        + struct.pack(">I", len(ihdr16))
        + b"IHDR"
        + ihdr16
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError):
        decode_png(deep)
    # 16-bit paletted is spec-illegal (ISO 15948 §11.2.2 table) — reject
    ihdr16p = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    deep_pal = (
        good[:8]
        + struct.pack(">I", len(ihdr16p))
        + b"IHDR"
        + ihdr16p
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16p) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError):
        decode_png(deep_pal)


# ISO/IEC 15948 §8.2 figure: which Adam7 pass owns each pixel of the
# repeating 8x8 starting grid. Hardcoded from the spec diagram so the
# decoder's pass table is pinned INDEPENDENTLY of the encoder (a mirrored
# pass-grid bug in both would not survive this fixture).
_ADAM7_GRID = [
    [1, 6, 4, 6, 2, 6, 4, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [5, 6, 5, 6, 5, 6, 5, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [3, 6, 4, 6, 3, 6, 4, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
    [5, 6, 5, 6, 5, 6, 5, 6],
    [7, 7, 7, 7, 7, 7, 7, 7],
]


def _png_from_raw(width, height, raw, ctype=0, interlace=1):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, interlace)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def test_adam7_decode_matches_spec_diagram_8x8():
    """Hand-built 8x8 greyscale Adam7 IDAT straight from the spec's pass
    diagram (filter 0 everywhere) — pins pass order, origins, and strides
    against the published figure, not against our own encoder."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8), np.uint8)
    raw = bytearray()
    for p in range(1, 8):
        for y in range(8):
            xs = [x for x in range(8) if _ADAM7_GRID[y][x] == p]
            if xs:
                raw.append(0)  # filter type None
                raw += bytes(int(img[y, x]) for x in xs)
    dw, dh, dc, px = decode_png(_png_from_raw(8, 8, bytes(raw)))
    assert (dw, dh, dc) == (8, 8, 1)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(8, 8), img)


def test_adam7_decode_2x2_partial_passes():
    """2x2 RGB Adam7: only passes 1 (pixel 0,0), 6 (pixel 1,0) and
    7 (row 1) are non-empty; empty passes contribute NO scanlines."""
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = (
        b"\x00" + img[0, 0].tobytes()   # pass 1
        + b"\x00" + img[0, 1].tobytes()  # pass 6
        + b"\x00" + img[1].tobytes()     # pass 7 (both pixels of row 1)
    )
    dw, dh, dc, px = decode_png(_png_from_raw(2, 2, raw, ctype=2))
    assert (dw, dh, dc) == (2, 2, 3)
    assert px == img.tobytes()


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_adam7_roundtrip_each_filter_type(channels, f):
    rng = np.random.default_rng(100 + f * 10 + channels)
    w, h = 13, 11  # non-multiples of 8: exercises ragged pass dims
    img = rng.integers(0, 256, (h, w * channels), np.uint8)
    payload = encode_png(w, h, img.tobytes(), channels=channels,
                         interlace=True, filters=f)
    dw, dh, dc, px = decode_png(payload)
    assert (dw, dh, dc) == (w, h, channels)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w * channels), img)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_adam7_roundtrip_any_image(w, h, c, seed):
    """Any image, any per-pass-scanline filter mix, roundtrips exactly
    through the Adam7 path (including sizes where most passes are empty)."""
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import _pass_dims

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, h * w * c, np.uint8)
    total_rows = sum(ph for *_, ph in _pass_dims(w, h))
    filters = rng.integers(0, 5, total_rows).tolist()
    dw, dh, dc, px = decode_png(
        encode_png(w, h, img.tobytes(), channels=c, interlace=True, filters=filters)
    )
    assert (dw, dh, dc) == (w, h, c)
    assert np.array_equal(np.frombuffer(px, np.uint8), img)


def test_adam7_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (10, 9, 3), np.uint8)
    payload = encode_png(9, 10, img.tobytes(), channels=3, interlace=True, filters=4)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)))
    assert np.array_equal(theirs, img), "interlaced PNG is lossless: PIL must agree"


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_subbyte_greyscale_roundtrip(depth, interlace):
    """1/2/4-bit greyscale: packed MSB-first scanlines (per Adam7 pass when
    interlaced, each with its own pad bits), filter distance 1 byte, and
    the exact 255/(2^d-1) rescale to the 8-bit output contract."""
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import _pass_dims

    scale = {1: 255, 2: 85, 4: 17}[depth]
    rng = np.random.default_rng(depth * 7 + interlace)
    for w, h in [(1, 1), (3, 5), (8, 8), (13, 9), (17, 2)]:
        vals = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
        total = sum(p[-1] for p in _pass_dims(w, h)) if interlace else h
        filters = rng.integers(0, 5, total).tolist()
        dw, dh, dc, px = decode_png(
            encode_png(w, h, vals.tobytes(), channels=1, depth=depth,
                       interlace=interlace, filters=filters)
        )
        assert (dw, dh, dc) == (w, h, 1)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), vals * scale)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_paletted_roundtrip(depth, interlace):
    """Color type 3: PLTE lookup to the RGB output contract across all four
    legal index depths, both interlace methods, mixed filters."""
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        _pass_dims,
        encode_png_indexed,
    )

    rng = np.random.default_rng(depth * 13 + interlace)
    npal = min(256, 1 << depth)
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    for w, h in [(1, 1), (4, 4), (13, 9), (30, 3)]:
        idx = rng.integers(0, npal, (h, w), dtype=np.uint8)
        total = sum(p[-1] for p in _pass_dims(w, h)) if interlace else h
        filters = rng.integers(0, 5, total).tolist()
        dw, dh, dc, px = decode_png(
            encode_png_indexed(w, h, idx.tobytes(), pal, depth=depth,
                               interlace=interlace, filters=filters)
        )
        assert (dw, dh, dc) == (w, h, 3)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), pal[idx])


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [2, 8])
def test_paletted_trns_decodes_to_rgba(depth, interlace):
    """Per-palette-entry tRNS alpha: shorter-than-palette tables pad
    opaque, and the output gains an alpha channel (matching PIL's
    P->convert('RGBA') and cv2's BGRA for such files)."""
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    rng = np.random.default_rng(depth + interlace)
    npal = 1 << depth if depth < 8 else 7
    pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, npal - 1, dtype=np.uint8)  # short: last pads 255
    idx = rng.integers(0, npal, (6, 10), dtype=np.uint8)
    dw, dh, dc, px = decode_png(
        encode_png_indexed(10, 6, idx.tobytes(), pal, depth=depth,
                           interlace=interlace, trns=alpha, filters=4)
    )
    assert (dw, dh, dc) == (10, 6, 4)
    full_alpha = np.concatenate([alpha, [255]]).astype(np.uint8)
    exp = np.dstack([pal[idx], full_alpha[idx]])
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(6, 10, 4), exp)


@pytest.mark.parametrize("interlace", [False, True])
def test_grey_alpha_decodes_to_rgba(interlace):
    """Color type 4 (grey+alpha) normalizes to RGBA with the grey sample
    replicated — cv2's IMREAD_UNCHANGED expands LA PNGs to 4 channels and
    the PIL rung converts LA->RGBA, so the pure rung matches both. The
    filter distance for LA is 2 bytes (spp*depth/8), exercised by the
    Sub/Average/Paeth cases."""
    rng = np.random.default_rng(17 + interlace)
    for w, h in [(1, 1), (7, 3), (12, 9)]:
        la = rng.integers(0, 256, (h, w, 2), dtype=np.uint8)
        for f in (0, 1, 2, 3, 4):
            dw, dh, dc, px = decode_png(
                encode_png(w, h, la.tobytes(), channels=2, interlace=interlace, filters=f)
            )
            assert (dw, dh, dc) == (w, h, 4)
            assert np.array_equal(
                np.frombuffer(px, np.uint8).reshape(h, w, 4), la[:, :, [0, 0, 0, 1]]
            )


def test_grey_alpha_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(23)
    la = rng.integers(0, 256, (5, 8, 2), dtype=np.uint8)
    payload = encode_png(8, 5, la.tobytes(), channels=2, filters=3)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGBA"))
    _, _, dc, px = decode_png(payload)
    assert dc == 4
    assert np.array_equal(theirs, np.frombuffer(px, np.uint8).reshape(5, 8, 4))


def test_paletted_trns_rejects_overlong_table():
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    pal = [(1, 2, 3), (4, 5, 6)]
    with pytest.raises(ValueError):
        encode_png_indexed(2, 1, bytes(2), pal, trns=bytes(3))
    # decoder side: splice a 3-byte tRNS against a 2-entry palette
    good = encode_png_indexed(2, 1, bytes(2), pal, trns=bytes(2))
    t_at = good.index(b"tRNS") - 4
    t_len = struct.unpack_from(">I", good, t_at)[0] + 12
    body = bytes(3)
    chunk = (
        struct.pack(">I", len(body))
        + b"tRNS"
        + body
        + struct.pack(">I", zlib.crc32(b"tRNS" + body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(good[:t_at] + chunk + good[t_at + t_len :])


def test_paletted_trns_rejects_empty_chunk():
    """ISO 15948 §11.3.2.1 requires 1..palette-size tRNS entries for color
    type 3; a zero-length tRNS previously slipped through and silently
    switched output to all-opaque RGBA where cv2/PIL reject (ADVICE r8)."""
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    pal = [(1, 2, 3), (4, 5, 6)]
    good = encode_png_indexed(2, 1, bytes(2), pal, trns=bytes(2))
    t_at = good.index(b"tRNS") - 4
    t_len = struct.unpack_from(">I", good, t_at)[0] + 12
    empty = (
        struct.pack(">I", 0)
        + b"tRNS"
        + struct.pack(">I", zlib.crc32(b"tRNS") & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="empty tRNS"):
        decode_png(good[:t_at] + empty + good[t_at + t_len :])
    # the same palette without any tRNS still decodes (3-channel output)
    plain = encode_png_indexed(2, 1, bytes(2), pal)
    assert decode_png(plain)[2] == 3


def test_paletted_trns_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    payload = encode_png_indexed(3, 2, idx.tobytes(), pal, trns=bytes([0, 128]))
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGBA"))
    _, _, dc, px = decode_png(payload)
    assert dc == 4
    assert np.array_equal(theirs, np.frombuffer(px, np.uint8).reshape(2, 3, 4))


def test_paletted_rejects():
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    pal = [(i, 0, 255 - i) for i in range(4)]
    good = encode_png_indexed(5, 3, bytes(15), pal, depth=2)
    # strip the PLTE chunk: paletted stream without a palette must reject
    plte_at = good.index(b"PLTE") - 4
    plte_len = struct.unpack_from(">I", good, plte_at)[0] + 12
    without = good[:plte_at] + good[plte_at + plte_len :]
    with pytest.raises(ValueError):
        decode_png(without)
    # index beyond the palette must reject, not read out of bounds
    idx = bytes([0, 1, 2, 3, 3] * 3)
    payload = bytearray(encode_png_indexed(5, 3, idx, pal, depth=8))
    # shrink the palette to 3 entries by re-encoding with a longer index set
    with pytest.raises(ValueError):
        encode_png_indexed(5, 3, idx, pal[:3], depth=8)
    # craft the same via a decoder-side check: PLTE declares 3 entries
    short = encode_png_indexed(5, 3, bytes(15), pal[:3], depth=8)
    sp = short.index(b"PLTE") - 4
    gp = bytes(payload).index(b"PLTE") - 4
    gl = struct.unpack_from(">I", bytes(payload), gp)[0] + 12
    spliced = bytes(payload)[:gp] + short[sp : sp + 3 * 3 + 12] + bytes(payload)[gp + gl :]
    with pytest.raises(ValueError):
        decode_png(spliced)
    # illegal PLTE shapes
    for bad_body in (b"", bytes(4), bytes(769 + 2)):
        chunk = (
            struct.pack(">I", len(bad_body))
            + b"PLTE"
            + bad_body
            + struct.pack(">I", zlib.crc32(b"PLTE" + bad_body) & 0xFFFFFFFF)
        )
        broken = good[:plte_at] + chunk + good[plte_at + plte_len :]
        with pytest.raises(ValueError):
            decode_png(broken)
    # sub-byte depth on RGB/RGBA stays rejected
    with pytest.raises(ValueError):
        encode_png(4, 4, bytes(48), channels=3, depth=4)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    good_rgb = encode_png(4, 4, bytes(48), channels=3)
    deep = (
        good_rgb[:8]
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good_rgb[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError):
        decode_png(deep)


def test_paletted_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 7), dtype=np.uint8)
    payload = encode_png_indexed(7, 9, idx.tobytes(), pal, depth=4,
                                 interlace=True, filters=2)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGB"))
    assert np.array_equal(theirs, pal[idx])


def test_subbyte_greyscale_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    bits = np.array([[1, 0, 1, 0, 1], [0, 1, 1, 0, 0], [1, 1, 0, 1, 0]], np.uint8)
    payload = encode_png(5, 3, bits.tobytes(), channels=1, depth=1, filters=0)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("L"))
    assert np.array_equal(theirs, bits * 255)


def test_adam7_truncated_pass_data_rejected():
    good = encode_png(9, 7, bytes(63), channels=1, interlace=True)
    # re-wrap an IDAT that inflates one byte short
    import zlib as _z

    sig_ihdr = good[: 8 + 12 + 13]
    raw = _z.decompress(good[8 + 12 + 13 + 8 : -12 - 4])
    short = _z.compress(raw[:-1], 6)
    idat = (
        struct.pack(">I", len(short))
        + b"IDAT"
        + short
        + struct.pack(">I", _z.crc32(b"IDAT" + short) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(sig_ihdr + idat + good[-12:])


def test_decompression_bomb_and_huge_dims_rejected():
    """Hostile-corpus discipline (PIL's DecompressionBombError / cv2's
    CV_IO_MAX_IMAGE_PIXELS): a crafted IHDR past the 2^30 DECODED-BYTE cap
    (width*height*samples, ADVICE r8 — channel-aware, unlike a bare pixel
    cap) rejects before committing a raster, and a zip-bomb IDAT
    (kilobytes inflating to gigabytes) stops at the header-declared
    scanline size instead of materializing — both as ValueError,
    instantly."""
    good = encode_png(4, 4, bytes(48), channels=3)
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    huge = (
        good[:8]
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="2\\^30-byte"):
        decode_png(huge)
    # channel-aware: a 20000x20000 RGBA header is only 4e8 pixels (under
    # the old channel-blind 2^30-pixel cap) but 1.6e9 decoded bytes — the
    # exact ADVICE r8 scenario (~4.3 GB of scanlines) — must reject too
    rgba = encode_png(2, 2, bytes(16), channels=4)
    ihdr = struct.pack(">IIBBBBB", 20000, 20000, 8, 6, 0, 0, 0)
    huge = (
        rgba[:8]
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + rgba[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="2\\^30-byte"):
        decode_png(huge)
    # a greyscale header at the same pixel count stays ACCEPTED by the cap
    # (1 byte/pixel = the old greyscale bound) and fails later on scanline
    # size, proving the cap is byte- not pixel-denominated
    import bigdata_streaming_absa_vehicle_spark.operators.pngcodec as _png

    assert 20000 * 20000 * 1 <= _png._MAX_DECODE_BYTES
    bomb = zlib.compress(bytes(8 * 1024 * 1024), 9)  # 8 MB of zeros, ~8 KB
    idat = (
        struct.pack(">I", len(bomb)) + b"IDAT" + bomb
        + struct.pack(">I", zlib.crc32(b"IDAT" + bomb) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(good[: 8 + 12 + 13] + idat + good[-12:])
    # trailing bytes after the zlib stream still reject (pre-cap behavior)
    body = zlib.compress(bytes(4 * (4 * 3 + 1))) + b"JUNK"
    idat = (
        struct.pack(">I", len(body)) + b"IDAT" + body
        + struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(good[: 8 + 12 + 13] + idat + good[-12:])


def test_ancillary_chunks_skipped_but_crc_checked():
    good = encode_png(2, 2, bytes(12), channels=3)
    text = b"comment\x00hello"
    chunk = (
        struct.pack(">I", len(text))
        + b"tEXt"
        + text
        + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF)
    )
    with_text = good[: 8 + 12 + 13] + chunk + good[8 + 12 + 13 :]
    dw, dh, dc, px = decode_png(with_text)
    assert (dw, dh, dc) == (2, 2, 3) and px == bytes(12)
    corrupt = bytearray(with_text)
    corrupt[8 + 12 + 13 + 9] ^= 0x01  # flip a tEXt body byte, CRC now wrong
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))


def test_decode_image_dispatches_png_magic():
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import decode_image

    img = np.arange(60, dtype=np.uint8)
    dw, dh, dc, px = decode_image(encode_png(5, 4, img.tobytes(), channels=3))
    assert (dw, dh, dc) == (5, 4, 3)
    assert np.array_equal(np.frombuffer(px, np.uint8), img)


def test_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 8, 3), np.uint8)
    payload = encode_png(8, 6, img.tobytes(), channels=3, filters=[4, 3, 2, 1, 0, 4])
    theirs = np.asarray(PIL.open(io.BytesIO(payload)))
    assert np.array_equal(theirs, img), "PNG is lossless: PIL must agree exactly"


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_exact_roundtrip_any_image(w, h, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, h * w * c, np.uint8)
    filters = rng.integers(0, 5, h).tolist()
    dw, dh, dc, px = decode_png(encode_png(w, h, img.tobytes(), channels=c, filters=filters))
    assert (dw, dh, dc) == (w, h, c)
    assert np.array_equal(np.frombuffer(px, np.uint8), img)


def test_16bit_decode_msb_contract_all_color_types():
    """16-bit samples reduce to their MOST significant byte (the PIL
    direct-to-8-bit / cv2 CV_16U->CV_8U convention) across every
    non-paletted color type, both interlace methods, all five filters."""
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        w, h = 9 - ch, 5 + ch
        img = rng.integers(0, 65536, (h, w, ch), dtype=np.uint16)
        exp = (img >> 8).astype(np.uint8)
        ch_out = ch
        if ch == 2:  # grey+alpha normalizes to RGBA like the 8-bit path
            exp, ch_out = exp[:, :, [0, 0, 0, 1]], 4
        for kw in (
            {"filters": [(y % 5) for y in range(h)]},
            {"interlace": True, "filters": 4},
        ):
            payload = encode_png(
                w, h, img.astype(">u2").tobytes(), channels=ch, depth=16, **kw
            )
            dw, dh, dc, px = decode_png(payload)
            assert (dw, dh, dc) == (w, h, ch_out)
            assert np.array_equal(
                np.frombuffer(px, np.uint8).reshape(h, w, ch_out), exp
            )


def test_16bit_low_byte_is_invisible():
    """Two rasters differing only in the LOW bytes decode identically —
    pins the MSB reduction as the contract (a byte-order slip that read
    the low byte instead would differ on this input)."""
    hi = np.full((3, 4, 3), 0xAB00, np.uint16)
    lo = hi | 0x00CD
    a = decode_png(encode_png(4, 3, hi.astype(">u2").tobytes(), channels=3, depth=16))
    b = decode_png(encode_png(4, 3, lo.astype(">u2").tobytes(), channels=3, depth=16))
    assert a == b
    assert np.frombuffer(a[3], np.uint8)[0] == 0xAB


def test_16bit_encode_rejects_wrong_raster_size():
    # depth 16 takes TWO big-endian bytes per sample
    with pytest.raises(ValueError):
        encode_png(4, 3, bytes(4 * 3 * 3), channels=3, depth=16)
    # 16-bit paletted encode is spec-illegal
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png_indexed,
    )

    with pytest.raises(ValueError):
        encode_png_indexed(2, 1, bytes(2), [(1, 2, 3)], depth=16)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_16bit_roundtrip_msb(w, h, c, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w, c), dtype=np.uint16)
    filters = rng.integers(0, 5, h).tolist()
    dw, dh, dc, px = decode_png(
        encode_png(w, h, img.astype(">u2").tobytes(), channels=c, depth=16, filters=filters)
    )
    exp = (img >> 8).astype(np.uint8)
    if c == 2:
        exp, c = exp[:, :, [0, 0, 0, 1]], 4
    assert (dw, dh, dc) == (w, h, c)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, c), exp)


def test_16bit_interop_with_pillow_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(11)
    # 16-bit RGB: PIL decodes straight to 8-bit "RGB" mode by taking the
    # MSB — must equal the pure rung byte-for-byte
    img = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
    payload = encode_png(7, 5, img.astype(">u2").tobytes(), channels=3, depth=16)
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGB"))
    _, _, dc, px = decode_png(payload)
    assert np.array_equal(theirs, np.frombuffer(px, np.uint8).reshape(5, 7, dc))
    # 16-bit grey: PIL keeps precision (I;16/I mode) — compare against its
    # high byte to pin the same reduction
    grey = rng.integers(0, 65536, (4, 6, 1), dtype=np.uint16)
    payload = encode_png(6, 4, grey.astype(">u2").tobytes(), channels=1, depth=16)
    theirs16 = np.asarray(PIL.open(io.BytesIO(payload))).astype(np.uint16)
    _, _, _, px = decode_png(payload)
    assert np.array_equal(
        (theirs16 >> 8).astype(np.uint8),
        np.frombuffer(px, np.uint8).reshape(4, 6),
    )


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_property_decoder_never_crashes_on_garbage(data):
    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + data)
    except ValueError:
        pass


def test_corrupt_deflate_stream_raises_valueerror():
    """A CRC-valid IDAT wrapping garbage DEFLATE must still raise
    ValueError (not zlib.error) — the drop-don't-kill contract."""
    good = encode_png(2, 2, bytes(12), channels=3)
    bad_body = b"\x00garbage-not-deflate"
    idat = (
        struct.pack(">I", len(bad_body))
        + b"IDAT"
        + bad_body
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad_body) & 0xFFFFFFFF)
    )
    iend = good[-12:]
    with pytest.raises(ValueError):
        decode_png(good[: 8 + 12 + 13] + idat + iend)


def test_decode_image_pixels_handles_png_without_cv2(spark):
    """The S-08 ladder's pure rung now covers PNG: the Arrow-batched
    decode operator must decode PNG payloads with NO cv2/PIL installed,
    and still drop undecodable payloads without killing the task."""
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rows = [
        (1, encode_png(4, 2, bytes(range(24)), channels=3, filters=[3, 4])),
        (2, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_pixels(media).collect()}
    assert sorted(got) == [1]
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (4, 2, 3)
    assert got[1]["mean_intensity"] == sum(range(24)) / 24


def test_malformed_chunk_bodies_raise_valueerror():
    """A valid-CRC IHDR with a SHORT body must raise ValueError, never
    struct.error (the drop-don't-kill contract)."""
    body = struct.pack(">II", 4, 4)  # 8 bytes, IHDR needs 13
    chunk = (
        struct.pack(">I", len(body))
        + b"IHDR"
        + body
        + struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    )
    good = encode_png(2, 2, bytes(12), channels=3)
    with pytest.raises(ValueError):
        decode_png(good[:8] + chunk + good[8 + 12 + 13 :])
