"""Export-grid reprojection (reference prepareForExport spatial params,
image.py:741-862): validation, grid preservation, affine regridding and
cross-CRS warps with closed-form expectations."""

from __future__ import annotations

import numpy as np
import pytest

from geedim_spark import codecs, synth
from geedim_spark.operators import reproject as rp
from geedim_spark.operators.resample import resample_bilinear

SC = synth.SCALE  # 10 m


def _src(h=40, w=40, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.integers(1, 1000, size=(2, h, w)).astype(np.uint16)
    transform = (SC, 0.0, 1000.0, 0.0, -SC, 2000.0)
    return px, "EPSG:3857", transform


def test_validation_matches_reference_errors():
    # composite without fixed projection and without a full grid spec
    with pytest.raises(ValueError, match="fixed projection"):
        rp.validate_export_args(False)
    with pytest.raises(ValueError, match="fixed projection"):
        rp.validate_export_args(False, crs="EPSG:3857", scale=500)
    # full specs are accepted
    rp.validate_export_args(False, crs="EPSG:3857",
                            region=(0, 0, 100, 100), scale=10)
    rp.validate_export_args(
        False, crs="EPSG:3857",
        crs_transform=(10.0, 0, 0, 0, -10.0, 100), shape=(10, 10))
    # scale + shape mutually exclusive (image.py:812-817)
    with pytest.raises(ValueError, match="'scale' or 'shape'"):
        rp.validate_export_args(True, scale=10, shape=(4, 3))
    with pytest.raises(ValueError, match="requires 'shape'"):
        rp.validate_export_args(
            True, crs_transform=(10.0, 0, 0, 0, -10.0, 100))


def test_grid_preservation_is_bit_identical_crop():
    """image.py:820-833 / test_image.py:407-413: no scaling params + same
    CRS -> output keeps the source scale, sits at an INTEGER pixel
    offset, and overlapping pixels are bit-identical (no resampling)."""
    px, crs, t = _src()
    # region interior, deliberately NOT on pixel edges
    region = (1000.0 + 3.4 * SC, 2000.0 - 17.8 * SC,
              1000.0 + 21.7 * SC, 2000.0 - 2.1 * SC)
    grid = rp.resolve_grid(crs, t, (40, 40), region=region)
    assert grid.preserved
    assert grid.transform[0] == SC and grid.transform[4] == -SC
    off_x = (grid.transform[2] - t[2]) / SC
    off_y = (t[5] - grid.transform[5]) / SC
    assert off_x == int(off_x) and off_y == int(off_y)
    out = rp.reproject_array(px, crs, t, grid)
    assert out.dtype == px.dtype
    # snap: cols [3, 22), rows [2, 18)
    np.testing.assert_array_equal(out, px[:, 2:18, 3:22])


def test_grid_preservation_pads_outside_with_nodata():
    px, crs, t = _src(h=8, w=8)
    region = (1000.0 - 2 * SC, 2000.0 - 10 * SC,
              1000.0 + 4 * SC, 2000.0 + 2 * SC)
    grid = rp.resolve_grid(crs, t, (8, 8), region=region)
    assert grid.preserved and grid.shape == (12, 6)
    out = rp.reproject_array(px, crs, t, grid, nodata=0)
    np.testing.assert_array_equal(out[:, 2:10, 2:6], px[:, 0:8, 0:4])
    assert (out[:, :2, :] == 0).all() and (out[:, :, :2] == 0).all()
    assert (out[:, 10:, :] == 0).all()


def test_nearest_2x_decimation_closed_form():
    """scale=2*SC aligned to the source origin: target centres land at
    source position 2j+0.5 -> nearest = odd rows/cols."""
    px, crs, t = _src()
    grid = rp.resolve_grid(crs, t, (40, 40), scale=2 * SC)
    assert not grid.preserved and grid.shape == (20, 20)
    out = rp.reproject_array(px, crs, t, grid, resampling="near")
    np.testing.assert_array_equal(out, px[:, 1::2, 1::2].astype(np.float64))


def test_explicit_crs_transform_translation():
    """crs_transform with a whole-pixel translation + same scale =
    nearest-sampled crop (values exact)."""
    px, crs, t = _src()
    ct = (SC, 0.0, 1000.0 + 5 * SC, 0.0, -SC, 2000.0 - 7 * SC)
    grid = rp.resolve_grid(crs, t, (40, 40), crs_transform=ct, shape=(10, 12))
    assert grid.shape == (10, 12) and not grid.preserved
    out = rp.reproject_array(px, crs, t, grid, resampling="near")
    np.testing.assert_array_equal(out, px[:, 7:17, 5:17].astype(np.float64))


def test_bilinear_2x_upscale_matches_w4_kernel():
    """Aligned full-frame 2x upscale through the reprojection sampler
    must equal the existing W4 resample_bilinear kernel (same
    pixel-centre convention)."""
    px, crs, t = _src(h=16, w=16, seed=3)
    grid = rp.resolve_grid(crs, t, (16, 16), scale=SC / 2)
    assert grid.shape == (32, 32)
    out = rp.reproject_array(px, crs, t, grid, resampling="bilinear")
    ref = resample_bilinear(px, 32, 32)
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_bicubic_identity_grid_is_exact():
    """Bicubic on the identity grid (same transform, full shape) must
    reproduce the source exactly (kernel weights sum to 1 at integer
    positions)."""
    px, crs, t = _src(h=12, w=12, seed=5)
    grid = rp.GridSpec(crs, t, (12, 12))
    out = rp.reproject_array(px, crs, t, grid, resampling="bicubic")
    np.testing.assert_allclose(out, px.astype(np.float64), atol=1e-9)


def test_mercator_round_trip_and_cross_crs_warp():
    lon = np.array([-179.5, -30.0, 0.0, 42.7, 179.9])
    lat = np.array([-80.0, -10.5, 0.0, 51.3, 84.9])
    x, y = rp.merc_forward(lon, lat)
    lon2, lat2 = rp.merc_inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

    # warp 3857 -> 4326 -> back onto the source grid: nearest sampling
    # through the exact inverse chain reproduces interior pixels
    px, crs, t = _src(h=20, w=20, seed=7)
    dlat = SC / 111000.0
    g4326 = rp.resolve_grid(crs, t, (20, 20), crs="EPSG:4326",
                            scale=dlat / 4)
    mid = rp.reproject_array(px, crs, t, g4326, resampling="near")
    back = rp.reproject_array(
        mid, "EPSG:4326", g4326.transform,
        rp.GridSpec(crs, t, (20, 20)), resampling="near")
    inner = (slice(None), slice(1, -1), slice(1, -1))
    np.testing.assert_array_equal(back[inner], px[inner].astype(np.float64))


def test_reproject_images_operator_and_like(spark):
    """End-to-end Spark operator over synth images: 2x decimation closed
    form per image, plus `like` template routing."""
    imgs = synth.images_df(spark, 6, scalar_filter="fmt = 'raw'")
    out = rp.reproject_images(imgs, scale=2 * SC).collect()
    assert len(out) == imgs.count() > 0
    src = {r["image_id"]: r for r in imgs.collect()}
    for r in out:
        assert (r["h"], r["w"]) == (20, 20)
        px = codecs.decode(bytes(src[r["image_id"]]["bytes"]))
        got = codecs.decode(bytes(r["bytes"]))
        np.testing.assert_array_equal(got, px[:, 1::2, 1::2])
        # transform: same origin, doubled scale
        st = src[r["image_id"]]["transform"]
        assert r["transform"][0] == 2 * SC and r["transform"][2] == st[2]

    like_row = {"crs": "EPSG:3857",
                "transform": [2 * SC, 0.0, src["IMG/00000000"]["transform"][2],
                              0.0, -2 * SC, src["IMG/00000000"]["transform"][5]],
                "h": 20, "w": 20}
    out2 = rp.reproject_images(imgs, like=like_row).collect()
    assert all((r["h"], r["w"]) == (20, 20) for r in out2)
    assert all(r["transform"][0] == 2 * SC for r in out2)


def test_composite_without_fixed_projection_raises(spark):
    """API parity: a frame with no per-image transform (composite) needs
    the full grid spec (image.py:806-817)."""
    imgs = synth.images_df(spark, 3, scalar_filter="fmt = 'raw'") \
        .drop("transform")
    with pytest.raises(ValueError, match="fixed projection"):
        rp.reproject_images(imgs, scale=2 * SC)
