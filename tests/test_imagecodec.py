"""Byte-level tests for the vendored pure-Python image codec (S-08 pixel
path, VERDICT r5 item 5) and its Spark integration through
decode_image_pixels — these run in THIS container (no cv2/PIL needed); the
JPEG/PNG entropy-coded paths stay in test_real_kernels.py behind the env
gate."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql.types import StructType

from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
    decode_image,
    decode_image_deep,
    encode_bmp24,
    encode_pgm,
    encode_ppm,
)


def _gradient(n: int, seed: int = 0) -> bytes:
    return bytes((seed + i) % 256 for i in range(n))


# ---------------------------------------------------------------------------
# pure-python roundtrips
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_exact_bytes():
    px = _gradient(5 * 3 * 3, seed=17)
    w, h, c, got = decode_image(encode_ppm(5, 3, px))
    assert (w, h, c) == (5, 3, 3)
    assert got == px


def test_pgm_roundtrip_exact_bytes():
    px = _gradient(7 * 4, seed=99)
    w, h, c, got = decode_image(encode_pgm(7, 4, px))
    assert (w, h, c) == (7, 4, 1)
    assert got == px


@pytest.mark.parametrize("width", [1, 2, 3, 4, 5])
def test_bmp_roundtrip_all_padding_widths(width):
    """Row padding is (4 - 3w % 4) % 4 bytes; every residue class must
    decode back to the exact logical pixels (padding excluded, BGR
    unswizzled, bottom-up rows restored to top-down)."""
    px = _gradient(width * 3 * 3, seed=width)
    w, h, c, got = decode_image(encode_bmp24(width, 3, px))
    assert (w, h, c) == (width, 3, 3)
    assert got == px


def test_bmp_and_ppm_agree_on_same_logical_image():
    px = _gradient(6 * 2 * 3, seed=5)
    assert decode_image(encode_bmp24(6, 2, px)) == decode_image(encode_ppm(6, 2, px))


def test_netpbm_header_comments_and_whitespace():
    px = _gradient(2 * 2 * 3)
    payload = b"P6 # trailing comment\n# full-line comment\n  2\t2 # dims\n255\n" + px
    assert decode_image(payload) == (2, 2, 3, px)


def test_bmp_top_down_negative_height():
    """Top-down BMPs store height negative and rows in reading order."""
    px = _gradient(2 * 2 * 3, seed=40)
    buf = bytearray(encode_bmp24(2, 2, px))
    # flip to top-down: negate height and swap the two raster rows back
    height = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -height)
    off = struct.unpack_from("<I", buf, 10)[0]
    row = (3 * 2 + 3) // 4 * 4
    buf[off : off + row], buf[off + row : off + 2 * row] = (
        buf[off + row : off + 2 * row],
        buf[off : off + row],
    )
    assert decode_image(bytes(buf)) == (2, 2, 3, px)


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"\xff\xd8\xff\xe0 not actually decodable jpeg",  # JPEG magic
        b"P6\n4 4\n65535\n" + b"\x00" * 95,  # truncated 2-byte raster (r10:
        # a FULL 96-byte raster is now a legal 16-bit PPM, was a gate)
        b"P6\n4 4\n65536\n" + b"\x00" * 96,  # maxval above the spec ceiling
        b"P6\n4 4\n0\n",  # maxval 0 is not a legal netpbm header
        b"P6\n4 4\n255\n" + b"\x00" * 10,  # truncated raster
        b"BM" + b"\x00" * 20,  # truncated BMP header
    ],
)
def test_decode_rejects_bad_payloads(payload):
    with pytest.raises(ValueError):
        decode_image(payload)


def test_decode_rejects_compressed_and_nonstandard_bmp():
    buf = bytearray(encode_bmp24(2, 2, _gradient(12)))
    struct.pack_into("<I", buf, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_image(bytes(buf))
    buf = bytearray(encode_bmp24(2, 2, _gradient(12)))
    # relabeled 8-bpp: legal since r10 IF a color table fits before the
    # pixel data — this file's data offset leaves no room, so it still
    # rejects (as a malformed color table rather than an unsupported bpp)
    struct.pack_into("<H", buf, 28, 8)
    with pytest.raises(ValueError):
        decode_image(bytes(buf))
    buf = bytearray(encode_bmp24(2, 2, _gradient(12)))
    struct.pack_into("<H", buf, 28, 16)  # 16-bpp BI_RGB stays gated
    with pytest.raises(ValueError):
        decode_image(bytes(buf))


def _bmp(width, height, bpp, raster_rows, palette=(), top_down=False, clr_used=0):
    """Hand-assemble a BITMAPINFOHEADER BMP: `raster_rows` is the packed
    per-row bytes IN TOP-DOWN order (padded to 32 bits by the caller),
    `palette` is RGB triples stored as BGRx quads."""
    table = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    data_offset = 14 + 40 + len(table)
    rows = raster_rows if top_down else raster_rows[::-1]
    raster = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", data_offset + len(raster), 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height if top_down is False else -height,
        1, bpp, 0, len(raster), 2835, 2835, clr_used, 0,
    )
    return header + dib + table + raster


def test_bmp_8bpp_paletted():
    """8-bpp paletted BMP (r10): indices look up BGRx color-table quads to
    RGB, rows padded to 32 bits, bottom-up storage."""
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    # 3x2 image, rows padded to 4 bytes
    rows = [bytes((0, 1, 2, 0)), bytes((3, 3, 0, 0))]
    payload = _bmp(3, 2, 8, rows, pal, clr_used=4)
    w, h, c, px = decode_image(payload)
    assert (w, h, c) == (3, 2, 3)
    exp = bytes(v for i in (0, 1, 2, 3, 3, 0) for v in pal[i])
    assert px == exp
    # deep twin: identical at bit_depth 8
    assert decode_image_deep(payload) == (3, 2, 3, 8, exp)


def test_bmp_1bpp_and_4bpp_msb_first_packing():
    pal2 = [(10, 20, 30), (200, 210, 220)]
    # 10x1 at 1 bpp: bits 1010101010 pad to 4 bytes -> 0xAA 0x80 0x00 0x00
    payload = _bmp(10, 1, 1, [bytes((0xAA, 0x80, 0, 0))], pal2)
    w, h, c, px = decode_image(payload)
    assert (w, h, c) == (10, 1, 3)
    assert px == bytes(v for i in (1, 0) * 5 for v in pal2[i])
    pal16 = [(i, i * 2 % 256, 255 - i) for i in range(16)]
    # 3x1 at 4 bpp: high nibble first -> pixels 0xF, 0x3, 0x8
    payload = _bmp(3, 1, 4, [bytes((0xF3, 0x80, 0, 0))], pal16)
    w, h, c, px = decode_image(payload)
    assert (w, h, c) == (3, 1, 3)
    assert px == bytes(v for i in (15, 3, 8) for v in pal16[i])


def test_bmp_32bpp_rgba():
    """32-bpp BI_RGB (r10): BGRA quads, no row padding needed; the 4th
    byte surfaces as alpha (cv2 IMREAD_UNCHANGED parity), top-down flag."""
    rows = [bytes((1, 2, 3, 4, 5, 6, 7, 8)), bytes((9, 10, 11, 12, 13, 14, 15, 16))]
    w, h, c, px = decode_image(_bmp(2, 2, 32, rows, top_down=True))
    assert (w, h, c) == (2, 2, 4)
    assert px == bytes((3, 2, 1, 4, 7, 6, 5, 8, 11, 10, 9, 12, 15, 14, 13, 16))
    # bottom-up: same rows arrive reversed
    w, h, c, px = decode_image(_bmp(2, 2, 32, rows))
    assert px[:8] == bytes((3, 2, 1, 4, 7, 6, 5, 8))


def test_bmp_paletted_rejects():
    pal = [(1, 2, 3), (4, 5, 6)]
    good = _bmp(3, 1, 8, [bytes((0, 1, 0, 0))], pal, clr_used=2)
    # index beyond the declared table
    bad = bytearray(good)
    bad[-4] = 2  # first pixel byte -> index 2, table has 2 entries
    with pytest.raises(ValueError):
        decode_image(bytes(bad))
    # biClrUsed above 2^bpp
    bad = bytearray(_bmp(3, 1, 4, [bytes((0x01, 0, 0, 0))], pal, clr_used=2))
    struct.pack_into("<I", bad, 46, 17)
    with pytest.raises(ValueError):
        decode_image(bytes(bad))
    # truncated color table (offset points inside it)
    bad = bytearray(good)
    struct.pack_into("<I", bad, 10, 14 + 40 + 4)  # table needs 8 bytes
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


# ---------------------------------------------------------------------------
# Spark integration: the pure backend through the mapInPandas operator
# ---------------------------------------------------------------------------


def test_decode_image_pixels_pure_backend_exact_means(spark):
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        DECODED_PIXELS_SCHEMA,
        decode_image_pixels,
    )

    rows = [
        (1, encode_ppm(4, 2, bytes([10] * 24))),  # constant image, mean 10
        (2, encode_bmp24(3, 3, _gradient(27))),  # gradient 0..26, mean 13
        (3, b"\xff\xd8\xffJPEG-without-cv2"),  # dropped, not task-fatal
        (4, encode_pgm(5, 2, bytes(range(10)))),  # grayscale, mean 4.5
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_image_pixels(media)
    assert out.schema == StructType.fromDDL(DECODED_PIXELS_SCHEMA)
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == [1, 2, 4]  # the fake JPEG is dropped
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (4, 2, 3)
    assert got[1]["mean_intensity"] == 10.0
    assert got[2]["mean_intensity"] == 13.0
    assert (got[4]["width"], got[4]["height"], got[4]["n_channels"]) == (5, 2, 1)
    assert got[4]["mean_intensity"] == 4.5


def test_resize_pixels_identity_when_small_and_downscale_when_large(spark):
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        RESIZED_PIXELS_SCHEMA,
        resize_pixels,
    )
    from pyspark.sql.types import StructType as _ST

    small = encode_ppm(4, 2, bytes([7] * 24))            # fits 16x16: identity
    big = encode_ppm(32, 8, bytes([9] * (32 * 8 * 3)))   # shrinks 2x: 16x4
    rows = [(1, small), (2, big), (3, b"not an image")]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = resize_pixels(media, max_dim=16)
    assert out.schema == _ST.fromDDL(RESIZED_PIXELS_SCHEMA)
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == [1, 2]
    assert (got[1]["out_width"], got[1]["out_height"]) == (4, 2)
    assert got[1]["out_mean"] == 7.0
    assert (got[2]["in_width"], got[2]["in_height"]) == (32, 8)
    assert (got[2]["out_width"], got[2]["out_height"]) == (16, 4)
    assert got[2]["out_mean"] == 9.0


def test_resize_pixels_handles_r8_png_formats_via_shared_ladder(spark):
    """resize_pixels walks the SAME _pixel_backend ladder as
    decode_image_pixels (ADVICE r6 item 1), so the round-8 PNG additions
    (paletted, 1-bit grey, grey+alpha->RGBA) resize through the pure rung
    with exact closed-form means."""
    import numpy as np

    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import resize_pixels
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png,
        encode_png_indexed,
    )

    # 4x2 paletted, constant index 1 -> constant RGB (50, 100, 150)
    pal = [(0, 0, 0), (50, 100, 150)]
    paletted = encode_png_indexed(4, 2, bytes([1] * 8), pal, depth=1)
    # 32x8 1-bit grey, all ones -> constant 255, shrinks 2x to 16x4
    bilevel = encode_png(32, 8, bytes([1] * 256), channels=1, depth=1)
    # 4x2 grey+alpha, grey 80 alpha 200 -> RGBA mean (3*80 + 200)/4
    la = np.full((2, 4, 2), 0, np.uint8); la[:, :, 0] = 80; la[:, :, 1] = 200
    ga = encode_png(4, 2, la.tobytes(), channels=2)
    media = spark.createDataFrame(
        [(1, paletted), (2, bilevel), (3, ga)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in resize_pixels(media, max_dim=16).collect()}
    assert sorted(got) == [1, 2, 3]
    assert (got[1]["out_width"], got[1]["out_height"]) == (4, 2)
    assert got[1]["out_mean"] == (50 + 100 + 150) / 3
    assert (got[2]["out_width"], got[2]["out_height"]) == (16, 4)
    assert got[2]["out_mean"] == 255.0
    assert got[3]["out_mean"] == (3 * 80 + 200) / 4


def test_resize_pixels_nearest_neighbor_indexing_is_floor_based(spark):
    """A 4x1 image [0, 60, 120, 180] shrunk to 2x1 must sample src pixels
    floor(0*4/2)=0 and floor(1*4/2)=2 -> values 0 and 120, mean 60."""
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import resize_pixels

    px = bytes(v for v in (0, 60, 120, 180) for _ in range(3))
    media = spark.createDataFrame([(1, encode_ppm(4, 1, px))], "doc_id long, payload binary")
    r = resize_pixels(media, max_dim=2).collect()[0]
    assert (r["out_width"], r["out_height"]) == (2, 1)
    assert r["out_mean"] == 60.0
