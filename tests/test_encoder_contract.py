"""Family-wide encoder input-faithfulness contract (r12).

The netpbm encoder's input-validation hardening (ADVICE r10 item 3, ADVICE
r11 items 1-2) is a CONTRACT, not a netpbm quirk: every vendored encoder
that accepts a pixel buffer must either encode the caller's samples
faithfully or raise ValueError — never silently reinterpret, truncate, or
wrap them, and never leak a foreign exception class.  Before r12 the
sibling encoders each did a bare ``len()`` + ``np.frombuffer`` (or a bare
``astype``): an int8 raster of -1s passed the size check and encoded as
255s (a reinterpret-cast of the two's-complement bytes), the LOSSLESS
encoder truncated fractional floats into a valid-looking roundtrip of the
wrong values, negatives sailed past max-only range checks into the
modulo-2^16 difference coder, NaN cast to INT64_MIN, and lists/str raised
TypeError.  These tests pin the shared contract over the whole family:

- ``_as_u8_raster`` (operators/imagecodec.py): netpbm maxval<=255, BMP24,
  baseline/progressive JPEG 8-bit planes;
- ``_as_sample_plane`` (operators/jpegcodec.py): lossless (2-16 bit),
  extended-sequential (8/12 bit), 12-bit progressive planes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import (
    decode_image,
    encode_bmp24,
    encode_pgm,
    encode_ppm,
)
from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_extended,
    encode_jpeg_gray,
    encode_jpeg_lossless,
    encode_jpeg_progressive_color,
    encode_jpeg_progressive_gray,
)

W, H = 8, 6
N = W * H


def _u8_encoders():
    """(label, fn(pixels)->bytes, n_samples) for every 8-bit-plane encoder."""
    cb = bytes(N)  # valid fixed chroma planes for the color encoders (4:4:4)
    return [
        ("pgm", lambda px: encode_pgm(W, H, px), N),
        ("ppm", lambda px: encode_ppm(W, H, px), 3 * N),
        ("bmp24", lambda px: encode_bmp24(W, H, px), 3 * N),
        ("jpeg_gray", lambda px: encode_jpeg_gray(W, H, px), N),
        ("jpeg_color_y", lambda px: encode_jpeg_color(W, H, px, cb, cb, subsample="444"), N),
        (
            "jpeg_prog_color_cr",
            lambda px: encode_jpeg_progressive_color(W, H, cb, cb, px, subsample="444"),
            N,
        ),
        ("jpeg_prog_gray", lambda px: encode_jpeg_progressive_gray(W, H, px), N),
        ("jpeg_lossless8", lambda px: encode_jpeg_lossless(W, H, px, precision=8), N),
        ("jpeg_extended8", lambda px: encode_jpeg_extended(W, H, px, precision=8), N),
    ]


def _deep_encoders():
    """(label, fn(samples)->bytes, bound) for the >8-bit plane encoders.

    Deep planes take array-likes (ints), so the canonical representation is
    an int64 array rather than bytes."""
    return [
        (
            "jpeg_lossless12",
            lambda px: encode_jpeg_lossless(W, H, px, precision=12),
            4096,
        ),
        (
            "jpeg_extended12",
            lambda px: encode_jpeg_extended(W, H, px, precision=12),
            4096,
        ),
        (
            "jpeg_prog_gray12",
            lambda px: encode_jpeg_progressive_gray(W, H, px, precision=12),
            4096,
        ),
        (
            "pgm16",
            lambda px: encode_pgm(W, H, px, maxval=65535),
            65536,
        ),
    ]


U8_IDS = [e[0] for e in _u8_encoders()]
DEEP_IDS = [e[0] for e in _deep_encoders()]


@pytest.mark.parametrize("which", range(len(U8_IDS)), ids=U8_IDS)
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    rep=st.sampled_from(
        ["bytes", "bytearray", "mv1", "list", "u8", "u16", "i64", "f64", "mv_wide", "arr2d"]
    ),
)
def test_u8_family_representation_invariance(which, seed, rep):
    """Every 8-bit-plane encoder emits byte-identical output for the same
    samples in ANY faithful representation: bytes, bytearray, itemsize-1
    memoryviews, lists, integer arrays of any dtype, exactly-integral
    floats, wide memoryviews, and multi-dimensional arrays."""
    label, enc, n = _u8_encoders()[which]
    vals = np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8)
    ref = enc(vals.tobytes())
    pixels = {
        "bytes": vals.tobytes(),
        "bytearray": bytearray(vals.tobytes()),
        "mv1": memoryview(vals.tobytes()),
        "list": [int(v) for v in vals],
        "u8": vals,
        "u16": vals.astype(np.uint16),
        "i64": vals.astype(np.int64),
        "f64": vals.astype(np.float64),
        "mv_wide": memoryview(vals.astype(np.int32)),
        "arr2d": vals.reshape(H, -1),
    }[rep]
    assert enc(pixels) == ref, label


@pytest.mark.parametrize("which", range(len(U8_IDS)), ids=U8_IDS)
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    bad=st.sampled_from(
        ["int8_neg", "int8_neg_mv", "frac", "nan", "inf", "over", "short", "long",
         "wide_mv_short", "str"]
    ),
)
def test_u8_family_rejects_unfaithful_input(which, seed, bad):
    """Every unfaithful input raises ValueError in every 8-bit-plane
    encoder — in particular the pre-r12 silent corruptions: int8 negatives
    (reinterpret-cast to 192..255), fractional floats (astype-floored), and
    NaN (defeats min/max range checks).  `wide_mv_short` is a memoryview
    over a wide dtype holding HALF the samples — its raw byte count equals
    the budget, so a frombuffer-style reinterpretation would accept and
    corrupt it, while the normalization contract must reject it as a size
    mismatch (a well-counted wide memoryview is a FAITHFUL representation,
    asserted in the invariance test above).  Foreign exception classes
    (TypeError for list/str) are contract breaches too."""
    label, enc, n = _u8_encoders()[which]
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, n, dtype=np.int64)
    i = int(rng.integers(0, n))
    if bad == "int8_neg":
        pixels = (vals % 127).astype(np.int8)
        pixels[i] = -1 - int(rng.integers(0, 128))
    elif bad == "int8_neg_mv":
        # itemsize-1 but SIGNED: must not take the raw-bytes fast path
        # (memoryview format 'b', caught by the r12 family fuzz)
        arr = (vals % 127).astype(np.int8)
        arr[i] = -1 - int(rng.integers(0, 128))
        pixels = memoryview(arr)
    elif bad == "frac":
        pixels = vals.astype(np.float64)
        pixels[i] += 0.5
    elif bad == "nan":
        pixels = vals.astype(np.float64)
        pixels[i] = np.nan
    elif bad == "inf":
        pixels = vals.astype(np.float64)
        pixels[i] = np.inf
    elif bad == "over":
        pixels = vals.copy()
        pixels[i] = 256 + int(rng.integers(0, 1000))
    elif bad == "short":
        pixels = bytes(n - 1)
    elif bad == "long":
        pixels = bytes(n + 1)
    elif bad == "wide_mv_short":
        pixels = memoryview(rng.integers(0, 256, n // 2, dtype=np.uint16))
    elif bad == "str":
        pixels = "x" * n
    with pytest.raises(ValueError):
        enc(pixels)


@pytest.mark.parametrize("which", range(len(DEEP_IDS)), ids=DEEP_IDS)
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    rep=st.sampled_from(["i64", "u16", "f64", "f32", "list", "arr2d"]),
)
def test_deep_family_representation_invariance(which, seed, rep):
    """The >8-bit plane encoders are representation-invariant across
    integer dtypes, exactly-integral floats, lists, and 2-D layouts."""
    label, enc, bound = _deep_encoders()[which]
    vals = np.random.default_rng(seed).integers(0, bound, N, dtype=np.int64)
    ref = enc(vals)
    pixels = {
        "i64": vals,
        "u16": vals.astype(np.uint16),
        "f64": vals.astype(np.float64),
        "f32": vals.astype(np.float64).astype(np.float32).astype(np.float64),
        "list": [int(v) for v in vals],
        "arr2d": vals.reshape(H, W),
    }[rep]
    if rep == "f32":
        # float32 can't represent every 16-bit value exactly; re-derive the
        # reference from the f32-roundtripped values instead of skipping
        ref = enc(pixels.astype(np.int64))
    assert enc(pixels) == ref, label


@pytest.mark.parametrize("which", range(len(DEEP_IDS)), ids=DEEP_IDS)
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    bad=st.sampled_from(["neg", "frac", "nan", "inf", "over", "short", "str"]),
)
def test_deep_family_rejects_unfaithful_input(which, seed, bad):
    """Deep planes reject negatives (pre-r12: mangled by the modulo-2^16
    difference coder or silently level-shifted), fractional floats (pre-r12:
    astype-truncated — fatal for a LOSSLESS codec), NaN/inf, out-of-range,
    wrong sizes, and non-numeric input, all with ValueError."""
    label, enc, bound = _deep_encoders()[which]
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, bound, N, dtype=np.int64)
    i = int(rng.integers(0, N))
    if bad == "neg":
        pixels = vals.copy()
        pixels[i] = -1 - int(rng.integers(0, 5))
    elif bad == "frac":
        pixels = vals.astype(np.float64)
        pixels[i] += 0.25
    elif bad == "nan":
        pixels = vals.astype(np.float64)
        pixels[i] = np.nan
    elif bad == "inf":
        pixels = vals.astype(np.float64)
        pixels[i] = np.inf
    elif bad == "over":
        pixels = vals.copy()
        pixels[i] = bound
    elif bad == "short":
        pixels = vals[:-1]
    elif bad == "str":
        pixels = ["x"] * N
    with pytest.raises(ValueError):
        enc(pixels)


def test_int8_reinterpret_regression():
    """The concrete pre-r12 corruption: an int8 raster of -1s encoded
    byte-identically to a 255 raster (two's-complement reinterpret-cast
    through np.frombuffer).  Now it must raise — and the all-255 bytes
    raster must still encode."""
    for label, enc, n in _u8_encoders():
        assert enc(bytes([255] * n)), label
        with pytest.raises(ValueError):
            enc(np.full(n, -1, dtype=np.int8))


def test_lossless_truncation_regression():
    """The concrete pre-r12 LOSSLESS corruption: fractional floats were
    astype(int64)-truncated, so encode([5.7,...]) roundtripped to 5 — a
    valid-looking decode of values the caller never supplied.  Exactly
    integral floats still encode and roundtrip exactly."""
    exact = np.full(N, 5.0)
    payload = encode_jpeg_lossless(W, H, exact, precision=12)
    # MSB readout contract: deep samples reduce to their top 8 bits
    got = np.frombuffer(decode_jpeg(payload)[3], np.uint8)
    assert np.array_equal(got, (exact.astype(np.int64) >> 4).astype(np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_lossless(W, H, np.full(N, 5.7), precision=12)


def test_valid_outputs_unchanged_golden():
    """The hardening must not move a single output byte for valid bytes
    input: golden digests computed from the r11 (pre-hardening) encoders
    and verified identical against the r12 ones before pinning."""
    import hashlib

    px1 = (np.arange(N, dtype=np.int64) * 7 % 256).astype(np.uint8).tobytes()
    px3 = (np.arange(3 * N, dtype=np.int64) * 11 % 256).astype(np.uint8).tobytes()
    digests = {
        "pgm": encode_pgm(W, H, px1),
        "ppm": encode_ppm(W, H, px3),
        "bmp24": encode_bmp24(W, H, px3),
        "jpeg_gray": encode_jpeg_gray(W, H, px1),
        "jpeg_color": encode_jpeg_color(W, H, px1, px1, px1, subsample="444"),
    }
    got = {k: hashlib.md5(v).hexdigest() for k, v in digests.items()}
    # decodability is the second half of the golden check
    assert decode_image(digests["pgm"])[:2] == (W, H)
    assert decode_image(digests["bmp24"])[:2] == (W, H)
    assert decode_jpeg(digests["jpeg_gray"])[:2] == (W, H)
    assert got == {
        "pgm": "bf17da24c0d9968e1772e60100280007",
        "ppm": "bc3cb60b93e634ea2d3fb9fe8d3c1d66",
        "bmp24": "44712149d030f28980d16932494874c6",
        "jpeg_gray": "3a3f7c2931d40c775cb9b0fc495132e3",
        "jpeg_color": "67d405dce3bc9479d267bba5c36a0dcd",
    }
