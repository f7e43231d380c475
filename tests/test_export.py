"""Export oracles — the reference's golden-array pattern
(/root/reference/tests/conftest.py:429-467 prepared_image;
test_image.py:500-603; test_tile.py:264-294 forced 2x2x2 split)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geedim_spark import codecs
from geedim_spark.functions.dtypes import promote_dtype, cast_pixels
from geedim_spark.operators import export_ops, resample
from geedim_spark.sources import snapshots as snap


def prepared_image_array() -> np.ndarray:
    """The numpy twin: 3 uint8 bands of constants (1,2,3), 20x20, 5-px
    masked (0) border — conftest.py:429-467 port."""
    px = np.zeros((3, 20, 20), dtype=np.uint8)
    for b in range(3):
        px[b, 5:15, 5:15] = b + 1
    return px


@pytest.fixture
def prepared_images(spark):
    golden = prepared_image_array()
    rows = [
        {"image_id": "PREP/00000000", "caption": "caption-prep-0",
         "bytes": codecs.encode_raw(golden)},
        {"image_id": "PREP/00000001", "caption": "caption-prep-1",
         "bytes": codecs.encode_raw((golden + 3) * (golden > 0))},
    ]
    return spark.createDataFrame(pd.DataFrame(rows)), golden


def test_export_roundtrip_bit_exact(spark, prepared_images):
    """Export -> tiles -> assemble == golden array, bit for bit."""
    images, golden = prepared_images
    tiles = export_ops.export_tiles(
        images, max_tile_size=4, max_tile_dim=11, max_tile_bands=2
    )
    rows = tiles.collect()
    by_img = {}
    for r in rows:
        by_img.setdefault(r["image_id"], []).append(r)
    # forced 2x2x2 split -> 8 tiles (test_tile.py:277-284 port)
    assert len(by_img["PREP/00000000"]) == 8
    out = export_ops.assemble_image(by_img["PREP/00000000"], 3, 20, 20, "uint8")
    assert np.array_equal(out, golden)
    out2 = export_ops.assemble_image(by_img["PREP/00000001"], 3, 20, 20, "uint8")
    assert np.array_equal(out2, (golden + 3) * (golden > 0))
    # caption equality through the export path (input_hint invariant)
    assert {r["caption"] for r in by_img["PREP/00000000"]} == {"caption-prep-0"}


def test_export_snapshot_commit_and_resume(spark, prepared_images, tmp_path):
    images, golden = prepared_images
    tiles = export_ops.export_tiles(images, max_tile_dim=11, max_tile_bands=2)
    table = str(tmp_path / "export_table")
    snap.write_snapshot(tiles, table, "image_id")
    back = snap.read_snapshot(spark, table)
    assert back.count() == 16
    # resume: everything committed -> nothing pending
    pending = snap.pending_keys(images, table, "image_id")
    assert pending.count() == 0


def test_prepare_for_export_scale_offset_dtype(spark, prepared_images):
    images, golden = prepared_images
    out = export_ops.prepare_for_export(
        images, scale_offset={0: (2.0, 10.0)}, dtype="uint16"
    ).filter("image_id = 'PREP/00000000'").first()
    px = codecs.decode(bytes(out["bytes"]))
    assert px.dtype == np.uint16
    assert (px[0] == golden[0].astype(np.uint16) * 2 + 10).all()
    assert (px[1] == golden[1]).all()  # untouched band passes through


def test_dtype_promotion_matches_reference():
    assert promote_dtype(["uint8", "uint8"]) == "uint8"
    assert promote_dtype(["uint8", "int8"]) == "int16"
    assert promote_dtype(["uint16", "int16"]) == "int32"
    assert promote_dtype(["uint8", "float32"]) == "float32"
    assert promote_dtype(["int32", "float32"]) == "float64"
    with pytest.raises(ValueError, match="int64"):
        promote_dtype(["int64"])


def test_cast_pixels_saturates():
    px = np.array([[-5.0, 300.0, 42.0]])
    assert cast_pixels(px, "uint8").tolist() == [[0, 255, 42]]


def test_resample_kernels():
    px = prepared_image_array()
    up = resample.resample(px, 40, 40, "bilinear")
    assert up.shape == (3, 40, 40)
    # constant interior stays constant under interpolation
    assert np.allclose(up[0, 14:26, 14:26], 1.0)
    down = resample.resample(px.astype(float), 10, 10, "average")
    assert down.shape == (3, 10, 10)
    # 2x2 block means: interior blocks of band 2 average to 3
    assert np.allclose(down[2, 3:7, 3:7], 3.0)
    cub = resample.resample(px, 40, 40, "bicubic")
    assert cub.shape == (3, 40, 40)
    assert np.allclose(cub[0, 16:24, 16:24], 1.0, atol=1e-9)
    with pytest.raises(ValueError, match="unknown resampling"):
        resample.resample(px, 10, 10, "nearest??")


def test_resample_images_composites_pass_through(spark):
    px = prepared_image_array()
    rows = [
        {"image_id": "A", "bytes": codecs.encode_raw(px), "fixed": True},
        {"image_id": "B", "bytes": codecs.encode_raw(px), "fixed": False},
    ]
    out = {
        r["image_id"]: bytes(r["bytes"])
        for r in resample.resample_images(
            spark.createDataFrame(pd.DataFrame(rows)), 40, 40
        ).collect()
    }
    assert codecs.decode(out["A"]).shape == (3, 40, 40)
    assert codecs.decode(out["B"]).shape == (3, 20, 20)  # unaltered


def test_resample_nodata_aware_no_halos():
    """Mask-aware resampling (normalised convolution): nodata pixels never
    blend into valid neighbours and unsupported outputs become nodata."""
    import numpy as np

    from geedim_spark.operators import resample as rs

    px = np.full((1, 8, 8), 100, np.uint16)
    px[0, :, :4] = 0  # nodata half
    out = rs.resample(px, 4, 4, "bilinear", nodata=0)
    # valid half stays exactly 100 (no dark halo at the boundary)
    assert np.all(out[0, :, 2:] == 100.0)
    # fully-nodata outputs stay nodata
    assert np.all(out[0, :, 0] == 0.0)

    # float dtype: NaN and -inf style nodata must not propagate
    fpx = np.full((1, 8, 8), 7.5, np.float64)
    fpx[0, :, :4] = -np.inf
    outf = rs.resample(fpx, 4, 4, "average", nodata=-np.inf)
    assert np.all(outf[0, :, 2:] == 7.5)
    assert np.all(np.isinf(outf[0, :, 0]))

    # default (nodata=None) keeps the raw blending semantics: a 3-wide
    # output samples position 3.5, straddling the nodata|valid boundary
    raw = rs.resample(px, 3, 3, "bilinear")
    assert 0.0 < raw[0, 0, 1] < 100.0  # blends toward 0
    # ...while the mask-aware form keeps it exactly 100
    aware = rs.resample(px, 3, 3, "bilinear", nodata=0)
    assert aware[0, 0, 1] == 100.0

    # bicubic variant: interior valid pixels unchanged, no halo leak
    outc = rs.resample(px, 4, 4, "bicubic", nodata=0)
    assert np.all(np.abs(outc[0, :, 3] - 100.0) < 1e-9)


def test_cast_pixels_unsupported_dtype_raises():
    """toDType('int64') raises in the reference (test_image.py:254-258,
    'Unsupported dtype' — image.py:66-73 defines no nodata for 64-bit
    ints); a silent cast would emit a table whose nodata convention no
    kernel understands."""
    import numpy as np
    import pytest

    from geedim_spark.functions.dtypes import cast_pixels

    px = np.ones((1, 4, 4), np.uint16)
    for bad in ("int64", "uint64", "complex64", "bool"):
        with pytest.raises(ValueError, match="Unsupported dtype"):
            cast_pixels(px, bad)
    assert cast_pixels(px, "uint8").dtype == np.uint8  # supported path OK


def test_pixel_histogram_bands_and_errors(spark):
    """Band 1 (QA) histogram on a known strip image + out-of-range band
    raises inside the kernel."""
    import pytest as _pytest

    from geedim_spark import synth
    from geedim_spark.operators import export_ops

    imgs = synth.images_df(spark, 8, scalar_filter="fmt = 'raw'")
    # i=2: c_px=(2%7)*2=4, qa bit 10 (i%3==2) -> band1 has 0 and 1024
    rows = {(r["image_id"], r["value"]): r["n_px"]
            for r in export_ops.pixel_histogram(imgs, band=1).collect()}
    assert rows[("IMG/00000002", 1024)] == 4 * 40
    assert rows[("IMG/00000002", 0)] == (40 - 4) * 40
    # i=0: c_px=0 -> all zeros
    assert rows[("IMG/00000000", 0)] == 40 * 40
    with _pytest.raises(ValueError, match="band must be"):
        export_ops.pixel_histogram(imgs, band=-1)
    with _pytest.raises(Exception, match="out of range"):
        export_ops.pixel_histogram(imgs, band=7).collect()
