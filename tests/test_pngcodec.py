"""Unit + property tests for the vendored pure-Python PNG codec
(operators/pngcodec.py) — the PNG half of the S-08 entropy-decode slice.

PNG is lossless, so the contract is byte-exact roundtrip for EVERY valid
image, across all five scanline filter types and all three supported color
types — plus hard rejects for everything outside the declared subset
(interlace, 16-bit, palette, corrupt CRCs, truncation).
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
    # rewrite IHDR to claim Adam7 interlace (and fix its CRC) — must reject
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
    # 16-bit depth claim
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
