"""Baseline JPEG codec tests: own-encode roundtrips plus hand-built
foreign files (3-component scans, restart markers, progressive
rejection) so the decoder is proven beyond its own encoder's output."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timebox_spark.operators import jpeg, multimodal


def test_block_constant_roundtrip_bit_exact():
    rng = np.random.RandomState(7)
    for bh, bw in [(1, 1), (2, 3), (3, 2)]:
        vals = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
        px = vals.repeat(8, axis=0).repeat(8, axis=1)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
        assert dec.shape == (bh * 8, bw * 8, 3)
        for c in range(3):
            assert (dec[:, :, c] == px).all()


def test_general_image_flat_quant_within_rounding():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
    assert np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max() <= 1


def test_non_multiple_of_8_dims_cropped():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max() <= 1


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht(cls: int, tid: int) -> bytes:
    return _seg(
        0xFFC4,
        bytes([cls << 4 | tid])
        + bytes(jpeg.DC_BITS if cls == 0 else jpeg.AC_BITS)
        + bytes(jpeg.DC_VALS if cls == 0 else jpeg.AC_VALS),
    )


def _entropy_dc_only(dcs: list[int]) -> bytes:
    """Huffman-encode a sequence of DC-only blocks (diff-coded)."""
    dc_code = jpeg._huff_codes(jpeg.DC_BITS, jpeg.DC_VALS)
    ac_code = jpeg._huff_codes(jpeg.AC_BITS, jpeg.AC_VALS)
    bw = jpeg._BitWriter()
    prev = 0
    for dc in dcs:
        size, extra = jpeg._magnitude(dc - prev)
        prev = dc
        code, ln = dc_code[size]
        bw.write(code, ln)
        if size:
            bw.write(extra, size)
        code, ln = ac_code[0x00]  # EOB
        bw.write(code, ln)
    return bw.flush()


def test_foreign_three_component_444_colors():
    """Hand-built 8x8 3-component 4:4:4 file with constant YCbCr —
    decode must apply the JFIF color transform."""
    y, cb, cr = 120, 80, 180
    # each component has its OWN DC predictor (starting at 0), but the
    # shared-chain helper emits diffs of consecutive inputs — feed it
    # cumulative sums so each emitted diff is that component's absolute
    dc = [8 * (y - 128), 8 * (cb - 128), 8 * (cr - 128)]
    entropy = _entropy_dc_only([dc[0], dc[0] + dc[1], dc[0] + dc[1] + dc[2]])
    buf = b"\xff\xd8"
    buf += _seg(0xFFDB, b"\x00" + bytes([1] * 64))
    buf += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    buf += _dht(0, 0) + _dht(1, 0)
    buf += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    buf += entropy + b"\xff\xd9"
    dec = jpeg.decode_jpeg(buf)
    assert dec.shape == (8, 8, 3)
    exp_r = round(y + 1.402 * (cr - 128))
    exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    exp_b = round(y + 1.772 * (cb - 128))
    assert (dec[:, :, 0] == exp_r).all()
    assert (dec[:, :, 1] == exp_g).all()
    assert (dec[:, :, 2] == exp_b).all()


def test_foreign_restart_markers_reset_dc_pred():
    """Grayscale 8x32 (4 MCUs) with DRI=2: DC predictors reset at the
    RST0 boundary, so values after the marker are absolute again."""
    vals = [40, 90, 200, 10]
    e1 = _entropy_dc_only([8 * (vals[0] - 128), 8 * (vals[1] - 128)])
    e2 = _entropy_dc_only([8 * (vals[2] - 128), 8 * (vals[3] - 128)])
    buf = b"\xff\xd8"
    buf += _seg(0xFFDB, b"\x00" + bytes([1] * 64))
    buf += _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    buf += _dht(0, 0) + _dht(1, 0)
    buf += _seg(0xFFDD, struct.pack(">H", 2))  # DRI = 2 MCUs
    buf += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    buf += e1 + b"\xff\xd0" + e2 + b"\xff\xd9"
    dec = jpeg.decode_jpeg(buf)
    for i, v in enumerate(vals):
        block = dec[:, 8 * i : 8 * (i + 1), 0]
        assert (block == v).all(), (i, v, block[0, 0])


def test_progressive_rejected():
    buf = b"\xff\xd8" + _seg(
        0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode_jpeg(buf)


def test_decode_image_dispatches_jpeg():
    px = multimodal.synth_jpeg_pixels(7)
    enc = jpeg.encode_jpeg_gray(px)
    dec = multimodal.decode_image(enc)
    assert dec.shape == (*px.shape, 3)
    assert (dec[:, :, 0] == px).all()


def test_foreign_420_subsampled_grayscale_chroma():
    """16x16 4:2:0 file: one MCU = 4 Y blocks + 1 Cb + 1 Cr. Constant
    neutral chroma (128) with per-block Y values checks MCU block
    ordering and nearest-neighbor chroma upsampling."""
    ys = [60, 120, 180, 240]  # Y blocks in raster order within the MCU
    # the helper diffs consecutive inputs, which IS the Y component's
    # DC chain (all four blocks belong to Y) — pass absolute DCs.
    # Cb/Cr each start a fresh predictor at 0 and need absolute 0, so
    # repeat the last Y value (diff 0 emitted for each).
    dc = [8 * (y - 128) for y in ys]
    entropy = _entropy_dc_only(dc + [dc[-1], dc[-1]])
    buf = b"\xff\xd8"
    buf += _seg(0xFFDB, b"\x00" + bytes([1] * 64))
    buf += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    buf += _dht(0, 0) + _dht(1, 0)
    buf += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    buf += entropy + b"\xff\xd9"
    dec = jpeg.decode_jpeg(buf)
    assert dec.shape == (16, 16, 3)
    # neutral chroma → RGB == Y everywhere; blocks in 2x2 raster order
    for bi, y in enumerate(ys):
        by, bx = divmod(bi, 2)
        block = dec[8 * by : 8 * (by + 1), 8 * bx : 8 * (bx + 1)]
        for c in range(3):
            assert (block[:, :, c] == y).all(), (bi, y, block[0, 0])


# ---------------- property-based (hypothesis)

from hypothesis import example, given, settings
from hypothesis import strategies as st


@given(
    st.integers(1, 40),   # height (any, not multiple of 8)
    st.integers(1, 40),   # width
    st.integers(0, 2**31 - 1),
)
@example(34, 26, 749715326)  # hypothesis-found error-2 case (round 6)
@settings(max_examples=25, deadline=None)
def test_flat_quant_roundtrip_error_bounded(h, w, seed):
    """For ANY grayscale image, flat-quant baseline roundtrip error is
    at most 3: quantization rounds 64 orthonormal-DCT coefficients by
    <=0.5 each, bounding spatial error by 0.5*(sum|M[u,x]|)^2 = 3.49,
    i.e. <=3 after the decoder's final integer rounding (jpeg.py
    docstring). The once-claimed +-1 was falsified by hypothesis at
    (34, 26, seed 749715326), pinned above: two roundings compound on
    noise-like blocks."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w)).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
    assert dec.shape == (h, w, 3)
    assert np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max() <= 3
    assert (dec[:, :, 0] == dec[:, :, 1]).all() and (dec[:, :, 1] == dec[:, :, 2]).all()


@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_block_constant_roundtrip_exact_property(bh, bw, seed):
    """Block-constant images round-trip bit-exactly at ANY block grid —
    the invariant the q30 oracle digest relies on."""
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
    px = vals.repeat(8, axis=0).repeat(8, axis=1)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg_gray(px))
    assert (dec[:, :, 0] == px).all()
