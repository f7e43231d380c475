"""Codec oracles: bit-exact raw round trip; PSNR >= 40 dB for lossy dct8
(BASELINE.json input_hint invariant)."""

from __future__ import annotations

import numpy as np

from geedim_spark import codecs


def _strip_image(v=57, f_px=8, c_px=4, w=40, h=40):
    px = np.zeros((2, h, w), dtype=np.uint16)
    px[0, :, :] = v
    px[0, :, :f_px] = 0
    px[1, :, w - c_px:] = 8
    return px


def test_raw_roundtrip_bit_exact():
    for dtype in ["uint8", "int16", "uint16", "int32", "float32", "float64"]:
        rng = np.random.default_rng(42)
        px = rng.integers(0, 100, size=(3, 17, 23)).astype(dtype)
        assert np.array_equal(codecs.decode(codecs.encode_raw(px)), px)
        assert codecs.decode(codecs.encode_raw(px)).dtype == px.dtype


def test_dct8_psnr_above_40db():
    rng = np.random.default_rng(7)
    # smooth-ish content (realistic for imagery) + strips
    base = rng.integers(0, 200, size=(2, 64, 64)).astype(np.uint16)
    smooth = base // 4 + 100
    for px in [_strip_image(), smooth]:
        dec = codecs.decode(codecs.encode_dct8(px))
        assert codecs.psnr(px, dec, 255.0) >= 40.0
        assert dec.dtype == px.dtype
        assert dec.shape == px.shape


def test_dct8_deterministic():
    px = _strip_image()
    assert codecs.encode_dct8(px) == codecs.encode_dct8(px.copy())


def test_nodata_vals_match_reference():
    """Same per-dtype nodata as /root/reference/geedim/image.py:55-64."""
    assert codecs.NODATA_VALS["uint8"] == 0
    assert codecs.NODATA_VALS["int16"] == -(2**15)
    # reference _nodata_vals uses -inf for both float types (image.py:55-64)
    assert codecs.NODATA_VALS["float32"] == float("-inf")
    assert codecs.NODATA_VALS["float64"] == float("-inf")


def test_phash_deterministic_and_discriminative():
    a = codecs.phash64(_strip_image(v=57))
    assert a == codecs.phash64(_strip_image(v=57))
    assert a != codecs.phash64(_strip_image(v=120))


def test_dct8_bright_uint16_psnr():
    """Regression: int16 coefficient storage clipped the DC term of any
    block with mean > ~8192 (real Landsat SR range), silently decoding
    bright content to garbage.  int32 coefficients hold the full range."""
    rng = np.random.default_rng(11)
    px = (20000 + rng.integers(0, 2000, size=(2, 24, 24))).astype(np.uint16)
    out = codecs.decode(codecs.encode(px, "dct8"))
    assert codecs.psnr(px.astype(float), out.astype(float), 65535.0) >= 40.0
    # QA-style bit-15 blocks survive too
    qa = np.full((1, 16, 16), 1 << 15, np.uint16)
    back = codecs.decode(codecs.encode(qa, "dct8"))
    assert codecs.psnr(qa.astype(float), back.astype(float), 65535.0) >= 40.0
