"""Property-based hardening for the pure-Python image codec (S-08): the
Spark-facing contract is (a) encode->decode is the identity on pixels and
geometry for every dimension/content combination, and (b) decode NEVER
raises anything but ValueError on arbitrary bytes — workers drop bad
payloads; any other exception class would kill the Arrow batch task."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
    decode_image,
    encode_bmp24,
    encode_pgm,
    encode_ppm,
)

dims = st.tuples(st.integers(1, 40), st.integers(1, 24))


@settings(max_examples=60, deadline=None)
@given(dims=dims, seed=st.integers(0, 255), step=st.integers(1, 255))
def test_ppm_and_bmp_roundtrip_identity(dims, seed, step):
    w, h = dims
    px = bytes((seed + step * i) % 256 for i in range(w * h * 3))
    assert decode_image(encode_ppm(w, h, px)) == (w, h, 3, px)
    assert decode_image(encode_bmp24(w, h, px)) == (w, h, 3, px)


@settings(max_examples=40, deadline=None)
@given(dims=dims, data=st.data())
def test_pgm_roundtrip_identity(dims, data):
    w, h = dims
    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)))
    assert decode_image(encode_pgm(w, h, px)) == (w, h, 1, px)


@settings(max_examples=120, deadline=None)
@given(payload=st.binary(max_size=600))
def test_decode_arbitrary_bytes_valueerror_or_valid(payload):
    try:
        w, h, c, px = decode_image(payload)
    except ValueError:
        return
    # c=4 possible since the r10 32-bpp BMP widening (RGBA out)
    assert w > 0 and h > 0 and c in (1, 3, 4)
    assert len(px) == w * h * c


@settings(max_examples=80, deadline=None)
@given(dims=dims, flip=st.data())
def test_mutated_valid_images_never_raise_foreign_exceptions(dims, flip):
    """Corrupt one byte of a valid payload anywhere: decode must either
    still succeed (cosmetic corruption) or raise ValueError — never
    IndexError/struct.error/etc."""
    w, h = dims
    payload = bytearray(encode_bmp24(w, h, bytes(w * h * 3)))
    i = flip.draw(st.integers(0, len(payload) - 1))
    payload[i] ^= flip.draw(st.integers(1, 255))
    try:
        ww, hh, c, px = decode_image(bytes(payload))
        assert len(px) == ww * hh * c
    except ValueError:
        pass


# ---- r11: property sweeps for the r10 BMP widenings (paletted + 32-bpp) ----

import struct

import numpy as np


def _bmp(width, height, bpp, raster_rows, palette=(), clr_used=0, top_down=False):
    """Minimal BI_RGB BMP builder (BITMAPINFOHEADER), palette in (r,g,b)."""
    table = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    data_offset = 14 + 40 + len(table)
    raster = b"".join(raster_rows if top_down else raster_rows[::-1])
    header = struct.pack("<2sIHHI", b"BM", data_offset + len(raster), 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height if top_down else height, 1, bpp, 0,
        len(raster), 2835, 2835, clr_used, 0,
    )
    return header + dib + table + raster


@settings(max_examples=60, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 12)),
    bpp=st.sampled_from([1, 4, 8]),
    seed=st.integers(0, 10_000),
    top_down=st.booleans(),
)
def test_paletted_bmp_decodes_to_lut_expansion(dims, bpp, seed, top_down):
    """Any 1/4/8-bpp BI_RGB BMP (either row order, any palette) decodes to
    exactly its LUT-expanded RGB — MSB-first sub-byte unpack, 32-bit row
    padding stripped."""
    w, h = dims
    rng = np.random.default_rng(seed)
    n_colors = 1 << bpp
    pal = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(n_colors)]
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    row_size = (bpp * w + 31) // 32 * 4
    rows = []
    for y in range(h):
        if bpp == 8:
            packed = idx[y].tobytes()
        else:
            bits = np.unpackbits(idx[y][:, None], axis=1, count=8)[:, 8 - bpp:]
            packed = np.packbits(bits.reshape(-1)).tobytes()
        rows.append(packed.ljust(row_size, b"\0"))
    payload = _bmp(w, h, bpp, rows, pal, n_colors, top_down)
    dw, dh, c, px = decode_image(payload)
    assert (dw, dh, c) == (w, h, 3)
    expect = np.array(pal, dtype=np.uint8)[idx]
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w, 3), expect)


# ---- r12: property sweeps for the encoder input-normalization contract ----
# (ADVICE r11 items 1-2: every in-range integer representation of the same
# samples encodes byte-identically; non-integral or out-of-range inputs are
# rejected with ValueError, never floored/truncated into a shifted raster)


@settings(max_examples=60, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 16), st.integers(1, 10)),
    seed=st.integers(0, 10_000),
    dtype=st.sampled_from(["uint8", "uint16", "int32", "int64", "float64"]),
    as_memoryview=st.booleans(),
)
def test_encoder_representation_invariance(dims, seed, dtype, as_memoryview):
    """encode_pgm(samples) is invariant to HOW the samples are represented:
    any integer dtype, exactly-integral floats, lists, and memoryviews of
    any itemsize all produce the byte raster of the canonical bytes input."""
    w, h = dims
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, w * h, dtype=np.uint8)
    ref = encode_pgm(w, h, vals.tobytes())
    arr = vals.astype(dtype)
    pixels = memoryview(arr) if as_memoryview else arr
    assert encode_pgm(w, h, pixels) == ref
    assert encode_pgm(w, h, [int(v) for v in vals]) == ref


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 30),
    seed=st.integers(0, 10_000),
    maxval=st.sampled_from([255, 4095, 65535]),
    bad=st.sampled_from(["frac", "nan", "neg", "over"]),
)
def test_encoder_rejects_unfaithful_samples(n, seed, maxval, bad):
    """Any sample set containing a fractional value, NaN, a negative, or a
    value above maxval is rejected with ValueError in both the 1-byte and
    2-byte branches — never silently coerced."""
    import pytest

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, maxval + 1, n).astype(np.float64)
    i = int(rng.integers(0, n))
    vals[i] = {"frac": vals[i] + 0.5, "nan": np.nan,
               "neg": -1.0, "over": maxval + 1.0}[bad]
    with pytest.raises(ValueError):
        encode_pgm(n, 1, vals, maxval=maxval)


@settings(max_examples=40, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 16), st.integers(1, 10)),
    seed=st.integers(0, 10_000),
    top_down=st.booleans(),
)
def test_bmp32_decodes_bgra_to_rgba(dims, seed, top_down):
    """Any 32-bpp BI_RGB BMP decodes its BGRA quads to RGBA verbatim (the
    4th byte surfaces as alpha, cv2 IMREAD_UNCHANGED parity)."""
    w, h = dims
    rng = np.random.default_rng(seed)
    bgra = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    payload = _bmp(w, h, 32, [bgra[y].tobytes() for y in range(h)], top_down=top_down)
    dw, dh, c, px = decode_image(payload)
    assert (dw, dh, c) == (w, h, 4)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w, 4), bgra[:, :, [2, 1, 0, 3]]
    )
