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
    assert w > 0 and h > 0 and c in (1, 3)
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
