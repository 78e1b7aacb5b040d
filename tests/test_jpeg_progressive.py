"""Unit tests for the progressive (SOF2, T.81 Annex G) half of the vendored
JPEG codec — VERDICT r7 item 7: the one format slice a real camera/web
corpus still hit that the pure ladder dropped.

The load-bearing invariant: a COMPLETE progressive scan script reconstructs
exactly the same quantized coefficients as the baseline encoder, so
``decode(progressive)`` must be byte-identical to ``decode(baseline)`` for
the same raster — which q416/q418 already certify against closed-form DuckDB
oracles.  Everything else (EOBn runs, refinement correction bits, ZRL inside
refinement, non-interleaved sub-grid addressing, DHT redefinition between
scans, partial files) is exercised against that equality or directly.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
    _PROG_SCRIPT,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
    encode_jpeg_progressive_color,
    encode_jpeg_progressive_gray,
)


def _rand(w, h, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(8, 8), (16, 24), (13, 7), (40, 40), (31, 9), (64, 48)])
def test_gray_progressive_equals_baseline(w, h):
    img = _rand(w, h, w * 100 + h)
    base = decode_jpeg(encode_jpeg_gray(w, h, img.tobytes()))
    prog = decode_jpeg(encode_jpeg_progressive_gray(w, h, img.tobytes()))
    assert prog == base


@pytest.mark.parametrize("sub,fh,fv", [("444", 1, 1), ("420", 2, 2), ("422", 2, 1), ("440", 1, 2)])
@pytest.mark.parametrize("w,h", [(16, 16), (13, 7), (20, 12), (9, 11)])
def test_color_progressive_equals_baseline(sub, fh, fv, w, h):
    cw, ch = (w + fh - 1) // fh, (h + fv - 1) // fv
    y, cb, cr = _rand(w, h, 1), _rand(cw, ch, 2), _rand(cw, ch, 3)
    args = (w, h, y.tobytes(), cb.tobytes(), cr.tobytes())
    base = decode_jpeg(encode_jpeg_color(*args, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive_color(*args, subsample=sub))
    assert prog == base


def test_long_eob_runs_constant_image():
    """A constant raster zeroes every AC coefficient, so each AC scan is one
    EOBn run spanning ALL blocks — 120 blocks needs the multi-bit EOBn
    symbols (r >= 1) the Annex-K baseline tables cannot even express."""
    img = np.full((48, 160), 77, np.uint8)  # 6x20 = 120 blocks
    base = decode_jpeg(encode_jpeg_gray(160, 48, img.tobytes()))
    prog = decode_jpeg(encode_jpeg_progressive_gray(160, 48, img.tobytes()))
    assert prog == base
    w, h, c, px = prog
    assert np.frombuffer(px, np.uint8).min() == np.frombuffer(px, np.uint8).max() == 77


def test_sparse_high_frequency_zrl_paths():
    """One hot pixel per block row creates long intra-block zero runs (ZRL
    in first scans) and isolated newly-nonzero coefficients among zero
    history (ZRL-equivalent skips inside refinement scans)."""
    img = np.full((32, 32), 128, np.uint8)
    img[::7, ::11] = 255
    base = decode_jpeg(encode_jpeg_gray(32, 32, img.tobytes()))
    prog = decode_jpeg(encode_jpeg_progressive_gray(32, 32, img.tobytes()))
    assert prog == base


@pytest.mark.parametrize(
    "script",
    [
        # single stage, no successive approximation: DC then one AC band
        ((0, 0, 0, 0), (1, 63, 0, 0)),
        # many narrow bands, still single stage
        ((0, 0, 0, 0), (1, 2, 0, 0), (3, 9, 0, 0), (10, 35, 0, 0), (36, 63, 0, 0)),
        # deep successive approximation on AC (3 refinement stages)
        (
            (0, 0, 0, 2),
            (1, 63, 0, 3),
            (1, 63, 3, 2),
            (0, 0, 2, 1),
            (1, 63, 2, 1),
            (0, 0, 1, 0),
            (1, 63, 1, 0),
        ),
    ],
)
def test_alternate_scan_scripts(script):
    img = _rand(24, 16, 99)
    base = decode_jpeg(encode_jpeg_gray(24, 16, img.tobytes()))
    prog = decode_jpeg(encode_jpeg_progressive_gray(24, 16, img.tobytes(), scans=script))
    assert prog == base


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_restart_markers_in_progressive_scans(ri):
    """DRI/RSTn inside progressive scans: every boundary must flush pending
    EOBn runs (plus their buffered correction bits), byte-align, and reset
    the DC predictor — the decoder checks the RSTn sequence number and
    resets the same state."""
    img = _rand(40, 40, ri)
    base = decode_jpeg(encode_jpeg_gray(40, 40, img.tobytes()))
    prog = decode_jpeg(
        encode_jpeg_progressive_gray(40, 40, img.tobytes(), restart_interval=ri)
    )
    assert prog == base


def test_restart_truncates_eob_runs():
    """A constant raster makes each AC scan one long EOBn run; restart
    boundaries must truncate the run exactly at the interval or the reader
    desyncs from the RSTn markers."""
    img = np.full((48, 160), 99, np.uint8)
    base = decode_jpeg(encode_jpeg_gray(160, 48, img.tobytes()))
    for ri in (1, 5, 17):
        prog = decode_jpeg(
            encode_jpeg_progressive_gray(160, 48, img.tobytes(), restart_interval=ri)
        )
        assert prog == base


def test_partial_file_decodes_coarse_approximation():
    """A progressive file whose refinement scans are missing is LEGAL and
    decodes to a coarser image (low coefficient bits zero) — the decoder
    must reconstruct from whatever scans arrived, not demand completeness."""
    img = _rand(16, 16, 5)
    dc_only = ((0, 0, 0, 1),)
    w, h, c, px = decode_jpeg(encode_jpeg_progressive_gray(16, 16, img.tobytes(), scans=dc_only))
    assert (w, h, c) == (16, 16, 1)
    # DC-only reconstruction: every 8x8 block is constant
    plane = np.frombuffer(px, np.uint8).reshape(16, 16)
    for by in range(2):
        for bx in range(2):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert blk.min() == blk.max()


def test_dht_redefinition_between_scans():
    """T.81 allows DHT segments between scans to redefine tables; splicing a
    duplicate DHT before the second SOS must not change the decode."""
    img = _rand(16, 8, 42)
    payload = encode_jpeg_progressive_gray(16, 8, img.tobytes())
    ref = decode_jpeg(payload)
    first_dht = payload.index(b"\xff\xc4")
    seglen = int.from_bytes(payload[first_dht + 2 : first_dht + 4], "big")
    dht_seg = payload[first_dht : first_dht + 2 + seglen]
    second_sos = payload.index(b"\xff\xda", payload.index(b"\xff\xda") + 2)
    spliced = payload[:second_sos] + dht_seg + payload[second_sos:]
    assert decode_jpeg(spliced) == ref


def test_q419_fixture_family_is_exact():
    """The q419 fixture rasters (DC + (4,4) basis, flat-8 quant) must decode
    EXACTLY through the progressive pipeline — the closed-form-oracle
    precondition."""
    sgn = np.where(np.isin(np.arange(8), (0, 3, 4, 7)), 1, -1)
    for did in (0, 1, 2, 3, 7, 23, 118):
        wb, hb = did % 5 + 1, did % 2 + 2
        w, h = 8 * wb, 8 * hb
        ky, kx = np.meshgrid(np.arange(h) // 8, np.arange(w) // 8, indexing="ij")
        k = ky * wb + kx
        dc = (11 * did + 7 * k) % 33 - 16
        ac = (5 * did + 3 * k) % 17 - 8
        img = (
            128 + dc + ac * np.outer(sgn[np.arange(h) % 8], sgn[np.arange(w) % 8])
        ).astype(np.uint8)
        dw, dh, c, px = decode_jpeg(encode_jpeg_progressive_gray(w, h, img.tobytes()))
        assert (dw, dh, c) == (w, h, 1)
        assert np.array_equal(np.frombuffer(px, np.uint8).reshape(h, w), img)


def test_malformed_progressive_scans_raise():
    img = _rand(16, 8, 3)
    good = encode_jpeg_progressive_gray(16, 8, img.tobytes())

    def patch_sos_params(payload: bytes, which: int, ss, se, ahal) -> bytes:
        pos = -2
        for _ in range(which + 1):
            pos = payload.index(b"\xff\xda", pos + 2)
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        p = bytearray(payload)
        p[pos + 2 + seglen - 3 : pos + 2 + seglen] = bytes((ss, se, ahal))
        return bytes(p)

    # DC scan with Se != 0
    with pytest.raises(ValueError):
        decode_jpeg(patch_sos_params(good, 0, 0, 5, 0x01))
    # band out of range
    with pytest.raises(ValueError):
        decode_jpeg(patch_sos_params(good, 1, 64, 64, 0x02))
    # successive approximation refining more than one bit
    with pytest.raises(ValueError):
        decode_jpeg(patch_sos_params(good, 3, 1, 63, 0x31))
    # progressive payloads no longer raise wholesale: sanity-check good one
    assert decode_jpeg(good)[0] == 16
