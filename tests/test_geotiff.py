"""Pure-numpy GeoTIFF container: write -> hand-rolled parse -> bit-exact.

Mirrors the reference's GeoTIFF export behavior (image.py:954-1085):
band-interleaved striped layout, deflate, nodata tag, georeferencing,
reduced-resolution overview pages."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geedim_spark.sources import geotiff

TF = [10.0, 0.0, 1000.0, 0.0, -10.0, 5400.0]


@pytest.mark.parametrize("dtype", [
    "uint8", "int8", "uint16", "int16", "uint32", "int32",
    "float32", "float64",
])
@pytest.mark.parametrize("compress", [None, "deflate"])
def test_roundtrip_dtypes(tmp_path, dtype, compress):
    rng = np.random.default_rng(7)
    if np.issubdtype(np.dtype(dtype), np.floating):
        arr = rng.standard_normal((3, 17, 23)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(
            info.min, int(info.max) + 1, size=(3, 17, 23), dtype=dtype
        )
    p = str(tmp_path / f"{dtype}.tif")
    nbytes = geotiff.write_geotiff(
        p, arr, transform=TF, crs_epsg=3857, nodata=None, compress=compress,
        rows_per_strip=5,
    )
    import os
    assert nbytes == os.path.getsize(p)
    got, meta = geotiff.read_geotiff(p)
    assert got.dtype == arr.dtype
    assert np.array_equal(got, arr)
    assert meta["transform"] == TF
    assert meta["crs_epsg"] == 3857 and not meta.get("geographic")


def test_golden_prepared_image_roundtrip(tmp_path):
    """The reference's golden prepared-image array
    (tests/conftest.py:429-467 port, shared with test_export) written as a
    deflate GeoTIFF decodes bit-exact with correct geo tags."""
    from tests.test_export import prepared_image_array

    golden = prepared_image_array()
    p = str(tmp_path / "golden.tif")
    geotiff.write_geotiff(
        p, golden, transform=TF, crs_epsg=32734, nodata=0,
        description='{"system:index": "golden"}',
    )
    got, meta = geotiff.read_geotiff(p)
    assert np.array_equal(got, golden)
    assert meta["nodata"] == 0.0
    assert meta["crs_epsg"] == 32734
    assert meta["description"] == '{"system:index": "golden"}'


def test_deflate_strips_actually_compressed(tmp_path):
    """Deflate must shrink a constant image and each strip must inflate
    back — checked against the raw tag values, not the reader."""
    arr = np.full((1, 64, 64), 7, np.uint16)
    p = str(tmp_path / "c.tif")
    n = geotiff.write_geotiff(p, arr, compress="deflate")
    assert n < arr.nbytes // 4
    raw = open(p, "rb").read()
    (ifd,) = struct.unpack_from("<I", raw, 4)
    (n_entries,) = struct.unpack_from("<H", raw, ifd)
    tags = {}
    for k in range(n_entries):
        tag, typ, count = struct.unpack_from("<HHI", raw, ifd + 2 + 12 * k)
        tags[tag] = (typ, count, raw[ifd + 10 + 12 * k: ifd + 14 + 12 * k])
    assert struct.unpack("<H", tags[259][2][:2])[0] == 8  # deflate
    # single strip small enough to be inline
    (off,) = struct.unpack("<I", tags[273][2])
    (cnt,) = struct.unpack("<I", tags[279][2])
    plane = zlib.decompress(raw[off:off + cnt])
    assert np.array_equal(
        np.frombuffer(plane, np.uint16).reshape(64, 64), arr[0]
    )


def test_overview_pages(tmp_path):
    arr = np.arange(2 * 128 * 96, dtype=np.uint16).reshape(2, 128, 96)
    p = str(tmp_path / "ov.tif")
    geotiff.write_geotiff(
        p, arr, transform=TF, crs_epsg=3857, overviews=True,
        min_overview_dim=32,
    )
    full, meta = geotiff.read_geotiff(p, page=0)
    # 128x96 -> 64x48 -> 32x24 (halving continues while a dim >= 2*32)
    assert meta["n_pages"] == 3
    assert np.array_equal(full, arr)
    ov, meta1 = geotiff.read_geotiff(p, page=1)
    assert meta1["subfile_type"] == 1
    assert np.array_equal(ov, arr[:, ::2, ::2])
    ov2, _ = geotiff.read_geotiff(p, page=2)
    assert np.array_equal(ov2, arr[:, ::4, ::4])


def test_geographic_crs_and_inf_nodata(tmp_path):
    arr = np.zeros((1, 4, 4), np.float32)
    p = str(tmp_path / "geo.tif")
    geotiff.write_geotiff(
        p, arr, transform=[0.1, 0, -180.0, 0, -0.1, 90.0],
        crs_epsg=4326, geographic=True, nodata=float("-inf"),
    )
    _, meta = geotiff.read_geotiff(p)
    assert meta["geographic"] and meta["crs_epsg"] == 4326
    assert meta["nodata"] == float("-inf")


def test_write_guards(tmp_path):
    with pytest.raises(ValueError, match="unsupported dtype"):
        geotiff.write_geotiff(
            str(tmp_path / "x.tif"), np.zeros((1, 2, 2), np.int64)
        )
    with pytest.raises(ValueError, match="unsupported compression"):
        geotiff.write_geotiff(
            str(tmp_path / "x.tif"), np.zeros((1, 2, 2), np.uint8),
            compress="lzw",
        )
    with pytest.raises(ValueError, match=r"\(bands, h, w\)"):
        geotiff.write_geotiff(
            str(tmp_path / "x.tif"), np.zeros((1, 1, 2, 2), np.uint8)
        )


def test_overview_geo_tags_scale_per_level(tmp_path):
    arr = np.zeros((1, 128, 128), np.uint16)
    p = str(tmp_path / "ovg.tif")
    geotiff.write_geotiff(
        p, arr, transform=[10.0, 0, 500.0, 0, -10.0, 900.0],
        crs_epsg=3857, overviews=True, min_overview_dim=32,
    )
    _, m0 = geotiff.read_geotiff(p, page=0)
    _, m1 = geotiff.read_geotiff(p, page=1)
    _, m2 = geotiff.read_geotiff(p, page=2)
    assert m0["transform"] == [10.0, 0, 500.0, 0, -10.0, 900.0]
    assert m1["transform"] == [20.0, 0, 500.0, 0, -20.0, 900.0]
    assert m2["transform"] == [40.0, 0, 500.0, 0, -40.0, 900.0]


def test_write_geotiff_overwrite_guard(tmp_path):
    """toGeoTIFF overwrite parity (reference test_image.py:550-563): an
    existing file is refused unless overwrite=True."""
    import numpy as np
    import pytest

    from geedim_spark.sources import geotiff

    arr = np.ones((1, 8, 8), np.uint16)
    p = str(tmp_path / "ow.tif")
    geotiff.write_geotiff(p, arr)
    with pytest.raises(FileExistsError, match="overwrite=True"):
        geotiff.write_geotiff(p, arr)
    geotiff.write_geotiff(p, arr * 3, overwrite=True)
    got, _ = geotiff.read_geotiff(p)
    assert (got == 3).all()


# ---------------------------------------------------------------------------
# COG driver (reference enums.py Driver.cog)
# ---------------------------------------------------------------------------

def _walk_strip_offsets(path):
    """Minimal independent IFD walk: [(ifd_offset, [strip offsets])...]."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:4] == b"II*\x00"
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    out = []
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        offs = []
        for i in range(n):
            tag, typ, count = struct.unpack_from(
                "<HHI", buf, ifd_off + 2 + 12 * i
            )
            if tag == 273:  # StripOffsets
                val = buf[ifd_off + 2 + 12 * i + 8:ifd_off + 2 + 12 * i + 12]
                if count * 4 <= 4:
                    offs = list(struct.unpack("<I", val))
                else:
                    (p,) = struct.unpack("<I", val)
                    offs = list(struct.unpack_from("<" + "I" * count, buf, p))
        out.append((ifd_off, offs))
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)
    return out


def test_cog_pixels_and_tags_match_gtiff(tmp_path):
    """driver='cog' changes byte placement only: every page decodes
    bit-identical to the gtiff layout, with identical geo tags."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 60000, size=(2, 128, 96), dtype=np.uint16)
    pg = str(tmp_path / "g.tif")
    pc = str(tmp_path / "c.tif")
    geotiff.write_geotiff(pg, arr, transform=TF, crs_epsg=3857, nodata=0,
                          overviews=True, min_overview_dim=32)
    geotiff.write_geotiff(pc, arr, transform=TF, crs_epsg=3857, nodata=0,
                          min_overview_dim=32, driver="cog")
    for page in range(3):
        a, ma = geotiff.read_geotiff(pg, page=page)
        b, mb = geotiff.read_geotiff(pc, page=page)
        assert np.array_equal(a, b)
        assert ma == mb
    assert geotiff.read_geotiff(pc)[1]["n_pages"] == 3


def test_cog_layout_header_overviews_first_fullres_last(tmp_path):
    """The COG contract: IFDs at offset 8 (right after the header),
    overview data next (smallest level first), full-res data at the
    tail — one small range request reads header + every overview."""
    arr = np.arange(128 * 96, dtype=np.uint16).reshape(1, 128, 96)
    p = str(tmp_path / "cog.tif")
    geotiff.write_geotiff(p, arr, transform=TF, crs_epsg=3857,
                          min_overview_dim=32, driver="cog")
    pages = _walk_strip_offsets(p)
    assert len(pages) == 3  # 128x96 -> 64x48 -> 32x24
    assert pages[0][0] == 8  # first IFD immediately after the header
    main, ov1, ov2 = (offs for _, offs in pages)
    ifd_end = max(off for off, _ in pages)
    # every overview strip sits after the IFDs and before ALL main strips
    assert min(ov1 + ov2) > ifd_end
    assert max(ov2) < min(ov1) < min(main)  # smallest level first


def test_cog_deterministic_and_implies_overviews(tmp_path):
    arr = np.ones((1, 70, 70), np.uint16)
    p1, p2 = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
    # overviews left False: cog implies them (here 70<2*64 -> single page
    # is fine; use a bigger min dim so no overview fits)
    geotiff.write_geotiff(p1, arr, min_overview_dim=16, driver="cog")
    geotiff.write_geotiff(p2, arr, min_overview_dim=16, driver="cog")
    assert open(p1, "rb").read() == open(p2, "rb").read()
    assert geotiff.read_geotiff(p1)[1]["n_pages"] > 1
    with pytest.raises(ValueError, match="unsupported driver"):
        geotiff.write_geotiff(str(tmp_path / "x.tif"), arr, driver="jp2")
