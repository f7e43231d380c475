"""Pure-numpy GeoTIFF writer + reader (stdlib ``struct``/``zlib`` only).

The reference's user-facing deliverable is a georeferenced GeoTIFF written
through rasterio (image.py:954-1085: band-interleaved, deflate, nodata tag,
overviews, metadata tags).  This environment ships no GeoTIFF codec, so the
container is produced directly: a baseline little-endian TIFF with

- striped layout, ``PlanarConfiguration=2`` (band-separate — the
  ``interleave='band'`` the reference requests);
- optional zlib DEFLATE (``Compression=8``, what rasterio's
  ``compress='deflate'`` writes);
- GeoTIFF georeferencing via ``ModelPixelScaleTag`` + ``ModelTiepointTag``
  and a ``GeoKeyDirectoryTag`` carrying the EPSG code;
- the GDAL nodata convention (ASCII tag 42113), matching the reference's
  ``nodata`` profile entry;
- optional reduced-resolution overview pages (``NewSubfileType=1`` IFDs,
  the classic TIFF overview representation rasterio's
  ``build_overviews`` produces), decimated 2x per level;
- ``ImageDescription`` for the EE/STAC properties JSON the reference
  writes as dataset tags (image.py:1087-1116 ``_write_metadata``);
- ``driver='cog'`` (reference enums.py Driver.cog + image.py toGeoTIFF
  profile branch): the Cloud-Optimised layout — ALL IFDs at the front of
  the file, overview pixel data next (smallest level first), full-res
  data last, so an HTTP reader gets header + every overview with one
  small initial range request.  Same tags, same pixels; only byte
  placement differs, and :func:`read_geotiff` reads both identically.

:func:`read_geotiff` is the matching hand-rolled parser — used by the
tests as an independent decode, and as a minimal GeoTIFF *source* for
round-tripping files this writer produced.

Supported dtypes: uint8/int8/uint16/int16/uint32/int32/float32/float64
(the reference's export dtype set, image.py:55-64).
"""

from __future__ import annotations

import math
import os
import struct
import zlib

import numpy as np

# TIFF tag ids
_NEW_SUBFILE_TYPE = 254
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_IMAGE_DESCRIPTION = 270
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

# TIFF field types
_T_ASCII, _T_SHORT, _T_LONG, _T_DOUBLE = 2, 3, 4, 12
_TYPE_SIZE = {_T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}

_SAMPLE_FORMAT_CODE = {"u": 1, "i": 2, "f": 3}
_SUPPORTED_DTYPES = frozenset(
    {"uint8", "int8", "uint16", "int16", "uint32", "int32",
     "float32", "float64"}
)

# GeoTIFF keys (GeoTIFF 1.1 spec, public)
_GT_MODEL_TYPE = 1024        # 1 = projected, 2 = geographic
_GT_RASTER_TYPE = 1025       # 1 = PixelIsArea
_PROJECTED_CRS = 3072
_GEOGRAPHIC_CRS = 2048


def _pack_values(typ: int, values) -> bytes:
    if typ == _T_ASCII:
        return values  # already bytes, NUL-terminated by caller
    fmt = "<" + _TYPE_FMT[typ] * len(values)
    return struct.pack(fmt, *values)


class _IFD:
    """One image file directory: entries + an out-of-line data area."""

    def __init__(self):
        self.entries: list[tuple[int, int, int, bytes]] = []

    def add(self, tag: int, typ: int, values) -> None:
        if typ == _T_ASCII:
            raw = values.encode() + b"\x00"
            count = len(raw)
        else:
            try:
                count = len(values)
            except TypeError:
                values = [values]
                count = 1
            raw = _pack_values(typ, values)
        self.entries.append((tag, typ, count, raw))

    def replace(self, tag: int, typ: int, values) -> None:
        """Swap a tag's values for same-count ones (size-preserving — the
        COG layout fixes strip offsets after the IFD sizes are known)."""
        self.entries = [e for e in self.entries if e[0] != tag]
        self.add(tag, typ, values)

    def nbytes(self) -> int:
        """Size of the serialized IFD incl. out-of-line values."""
        n = 2 + 12 * len(self.entries) + 4
        n += sum(len(raw) for _, _, _, raw in self.entries if len(raw) > 4)
        return n

    def serialize(self, offset: int, next_ifd: int) -> bytes:
        """Serialize at absolute ``offset``; out-of-line values follow the
        entry table directly."""
        self.entries.sort(key=lambda e: e[0])  # spec: ascending tag order
        out_of_line = b""
        data_at = offset + 2 + 12 * len(self.entries) + 4
        body = struct.pack("<H", len(self.entries))
        for tag, typ, count, raw in self.entries:
            if len(raw) <= 4:
                val = raw + b"\x00" * (4 - len(raw))
            else:
                val = struct.pack("<I", data_at + len(out_of_line))
                out_of_line += raw
            body += struct.pack("<HHI", tag, typ, count) + val
        body += struct.pack("<I", next_ifd)
        return body + out_of_line


def _rows_per_strip(pixels: np.ndarray, rows_per_strip: int | None) -> int:
    if rows_per_strip is None:
        # classic TIFF guidance: ~64 KiB uncompressed strips
        w, itemsize = pixels.shape[2], pixels.dtype.itemsize
        rows_per_strip = max(1, 65536 // max(1, w * itemsize))
    return min(rows_per_strip, pixels.shape[1])


def _iter_page_strips(pixels: np.ndarray, rows_per_strip: int, compress: bool):
    """Yield the page's strips one at a time (planar config 2: all strips
    of band 0 first) — streaming form, peak memory = one strip."""
    bands, h, _ = pixels.shape
    for b in range(bands):
        for r0 in range(0, h, rows_per_strip):
            raw = np.ascontiguousarray(
                pixels[b, r0:r0 + rows_per_strip]
            ).tobytes()
            yield zlib.compress(raw, 6) if compress else raw


def _geokeys(crs_epsg: int | None, geographic: bool) -> list[int]:
    """GeoKeyDirectory: version 1.1.0 header + (key, 0, 1, value) entries."""
    keys = [(_GT_MODEL_TYPE, 2 if geographic else 1), (_GT_RASTER_TYPE, 1)]
    if crs_epsg is not None:
        keys.append(
            (_GEOGRAPHIC_CRS if geographic else _PROJECTED_CRS, int(crs_epsg))
        )
    out = [1, 1, 0, len(keys)]
    for k, v in keys:
        out += [k, 0, 1, v]
    return out


def _build_page(
    pixels: np.ndarray,
    transform,
    crs_epsg,
    geographic: bool,
    nodata,
    compress: bool,
    rows_per_strip: int | None,
    description: str | None,
    subfile_type: int,
    strip_byte_counts: list[int],
) -> _IFD:
    """Build the page's IFD from its (already written) strip byte counts —
    the strip DATA itself streams to the file via _iter_page_strips."""
    bands, h, w = pixels.shape
    itemsize = pixels.dtype.itemsize
    rows_per_strip = _rows_per_strip(pixels, rows_per_strip)

    ifd = _IFD()
    ifd.add(_NEW_SUBFILE_TYPE, _T_LONG, subfile_type)
    ifd.add(_IMAGE_WIDTH, _T_LONG, w)
    ifd.add(_IMAGE_LENGTH, _T_LONG, h)
    ifd.add(_BITS_PER_SAMPLE, _T_SHORT, [itemsize * 8] * bands)
    ifd.add(_COMPRESSION, _T_SHORT, 8 if compress else 1)
    ifd.add(_PHOTOMETRIC, _T_SHORT, 1)  # BlackIsZero
    if description:
        ifd.add(_IMAGE_DESCRIPTION, _T_ASCII, description)
    ifd.add(_SAMPLES_PER_PIXEL, _T_SHORT, bands)
    ifd.add(_ROWS_PER_STRIP, _T_LONG, rows_per_strip)
    ifd.add(_STRIP_BYTE_COUNTS, _T_LONG, strip_byte_counts)
    ifd.add(_PLANAR_CONFIG, _T_SHORT, 2)
    ifd.add(
        _SAMPLE_FORMAT, _T_SHORT,
        [_SAMPLE_FORMAT_CODE[pixels.dtype.kind]] * bands,
    )
    if transform is not None:
        sx, _, x0, _, nsy, y1 = [float(t) for t in transform]
        ifd.add(_MODEL_PIXEL_SCALE, _T_DOUBLE, [sx, abs(nsy), 0.0])
        ifd.add(_MODEL_TIEPOINT, _T_DOUBLE, [0.0, 0.0, 0.0, x0, y1, 0.0])
    if transform is not None or crs_epsg is not None:
        ifd.add(_GEO_KEY_DIRECTORY, _T_SHORT, _geokeys(crs_epsg, geographic))
    if nodata is not None:
        # GDAL convention: decimal string; -inf spelled the way GDAL writes it
        nd = float(nodata)
        if math.isinf(nd):
            txt = "-inf" if nd < 0 else "inf"
        elif float(nd).is_integer() and abs(nd) < 2**53:
            txt = str(int(nd))
        else:
            txt = repr(nd)
        ifd.add(_GDAL_NODATA, _T_ASCII, txt)
    return ifd


def write_geotiff(
    path: str,
    pixels: np.ndarray,
    transform=None,
    crs_epsg: int | None = None,
    geographic: bool = False,
    nodata=None,
    compress: str | None = "deflate",
    rows_per_strip: int | None = None,
    description: str | None = None,
    overviews: bool = False,
    min_overview_dim: int = 256,
    overwrite: bool = False,
    driver: str = "gtiff",
) -> int:
    """Write ``pixels`` (bands, h, w) as a striped (Geo)TIFF; returns bytes
    written.  ``transform`` is the 6-element affine (sx, 0, x0, 0, -sy, y1)
    the engine carries on every image row; ``compress`` is ``'deflate'`` or
    ``None``; ``overviews=True`` appends 2x-decimated reduced-resolution
    pages until both dims drop under ``min_overview_dim``.

    ``driver`` picks the byte layout (reference enums.py Driver):
    ``'gtiff'`` streams strips then appends the IFD chain (peak memory =
    one strip); ``'cog'`` places all IFDs first and the full-res data
    LAST (overviews, smallest level first, in between) — the
    Cloud-Optimised GeoTIFF reading pattern — and implies overviews.
    The COG path holds every COMPRESSED strip in memory (sizes must be
    known before any byte is placed); per-image exports are bounded by
    the reference's own 10 GB guard, so this is fine here.

    Baseline (non-Big) TIFF: total size must stay under 4 GiB — at scale
    the tiled snapshot table is the primary sink and per-image GeoTIFFs are
    bounded by the reference's own 10 GB/5000-image export guards.
    """
    if driver not in ("gtiff", "cog"):
        raise ValueError(f"unsupported driver {driver!r} (gtiff | cog)")
    if driver == "cog":
        overviews = True
    if not overwrite and os.path.exists(path):
        # reference toGeoTIFF parity (test_image.py:550-563): an existing
        # file is refused unless the caller opts into overwriting
        raise FileExistsError(
            f"{path} exists — pass overwrite=True to replace it"
        )
    if pixels.ndim == 2:
        pixels = pixels[None]
    if pixels.ndim != 3:
        raise ValueError(f"pixels must be (bands, h, w), got {pixels.shape}")
    if pixels.dtype.name not in _SUPPORTED_DTYPES:
        raise ValueError(
            f"unsupported dtype {pixels.dtype} (reference export set: "
            f"{sorted(_SUPPORTED_DTYPES)}, image.py:55-64)"
        )
    if compress not in (None, "none", "deflate"):
        raise ValueError(f"unsupported compression {compress!r}")
    if transform is not None:
        sx, b, x0, c, nsy, y1 = [float(t) for t in transform]
        # ModelPixelScale/ModelTiepoint can only express axis-aligned,
        # north-up transforms; shear terms or a positive y-scale would be
        # silently dropped / sign-flipped on round-trip.  (The general case
        # needs ModelTransformationTag, which this writer does not emit.)
        if b != 0.0 or c != 0.0:
            raise ValueError(
                f"non-axis-aligned transform (shear terms {b}, {c}): "
                "ModelPixelScale/ModelTiepoint cannot represent rotation or "
                "shear — resample to a north-up grid first"
            )
        if nsy >= 0.0:
            raise ValueError(
                f"y pixel scale must be negative (north-up rows), got {nsy}"
            )
    do_compress = compress == "deflate"

    # page list: main image + optional overview levels (2x decimation per
    # level; each page's geo tags carry ITS OWN pixel scale — the tiepoint
    # is unchanged because [::2] keeps the top-left pixel's origin)
    pages = [(pixels, 0, 1)]
    if overviews:
        level, factor = pixels, 1
        while (
            level.shape[1] >= 2 * min_overview_dim
            or level.shape[2] >= 2 * min_overview_dim
        ):
            level, factor = level[:, ::2, ::2], factor * 2
            pages.append((level, 1, factor))

    def _scaled_tf(f: int):
        if transform is None or f == 1:
            return transform
        sx, b, x0, c, nsy, y1 = [float(t) for t in transform]
        return [sx * f, b, x0, c, nsy * f, y1]

    limit_msg = (
        "bytes - past the 4 GiB baseline-TIFF limit; export smaller "
        "regions (the tiles table is the scale sink)"
    )

    if driver == "cog":
        # COG layout: header | ALL IFDs | overview data (smallest level
        # first) | full-res data last.  A range-reading HTTP client gets
        # the complete header + every overview in one small initial
        # request; the bulk full-res bytes sit at the tail.  Strip sizes
        # must be known before any byte is placed, so every compressed
        # strip is held in memory (bounded by the reference's 10 GB
        # per-export guard).
        page_strips = [
            list(_iter_page_strips(px, _rows_per_strip(px, rows_per_strip),
                                   do_compress))
            for px, _, _ in pages
        ]
        built = [
            _build_page(
                px, _scaled_tf(fct), crs_epsg, geographic, nodata,
                do_compress, rows_per_strip,
                description if lvl == 0 else None, lvl,
                [len(s) for s in strips],
            )
            for (px, lvl, fct), strips in zip(pages, page_strips)
        ]
        # placeholder offsets first so each IFD's byte size is final …
        for ifd, strips in zip(built, page_strips):
            ifd.add(_STRIP_OFFSETS, _T_LONG, [0] * len(strips))
        ifd_offsets, offset = [], 8
        for ifd in built:
            ifd_offsets.append(offset)
            offset += ifd.nbytes()
        # … then place data: overviews smallest-first, main page last
        data_order = list(range(1, len(pages)))[::-1] + [0]
        for k in data_order:
            offs = []
            for s in page_strips[k]:
                offs.append(offset)
                offset += len(s)
            built[k].replace(_STRIP_OFFSETS, _T_LONG, offs)
        if offset > 0xFFFFFFFF:
            raise ValueError(f"output would be {offset} {limit_msg}")
        with open(path, "wb") as f:
            f.write(b"II*\x00" + struct.pack("<I", ifd_offsets[0]))
            for k, ifd in enumerate(built):
                nxt = ifd_offsets[k + 1] if k + 1 < len(built) else 0
                f.write(ifd.serialize(ifd_offsets[k], nxt))
            for k in data_order:
                for s in page_strips[k]:
                    f.write(s)
        return offset

    # gtiff layout: header | all strip data | IFD chain.  Strips STREAM to
    # the file as they compress (peak memory = one strip, not ~2x the
    # file) and the header's first-IFD pointer is patched once the strip
    # section's total length is known.
    try:
        with open(path, "wb") as f:
            f.write(b"II*\x00" + struct.pack("<I", 0))  # pointer patched below
            offset = 8
            strip_offsets: list[list[int]] = []
            strip_lens: list[list[int]] = []
            for px, lvl, fct in pages:
                rps = _rows_per_strip(px, rows_per_strip)
                offs: list[int] = []
                lens: list[int] = []
                for strip in _iter_page_strips(px, rps, do_compress):
                    offs.append(offset)
                    lens.append(len(strip))
                    f.write(strip)
                    offset += len(strip)
                    if offset > 0xFFFFFFFF:
                        raise ValueError(f"output past {offset} {limit_msg}")
                strip_offsets.append(offs)
                strip_lens.append(lens)

            built = [
                _build_page(
                    px, _scaled_tf(fct), crs_epsg, geographic, nodata,
                    do_compress, rows_per_strip,
                    description if lvl == 0 else None, lvl, lens,
                )
                for (px, lvl, fct), lens in zip(pages, strip_lens)
            ]
            ifd_offsets = []
            for ifd, offs in zip(built, strip_offsets):
                ifd.add(_STRIP_OFFSETS, _T_LONG, offs)
                ifd_offsets.append(offset)
                offset += ifd.nbytes()
            if offset > 0xFFFFFFFF:
                raise ValueError(f"output would be {offset} {limit_msg}")
            for k, ifd in enumerate(built):
                nxt = ifd_offsets[k + 1] if k + 1 < len(built) else 0
                f.write(ifd.serialize(ifd_offsets[k], nxt))
            f.seek(4)
            f.write(struct.pack("<I", ifd_offsets[0]))
    except ValueError:
        # don't leave a truncated, unreadable file behind
        if os.path.exists(path):
            os.remove(path)
        raise
    return offset


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _read_values(buf: bytes, typ: int, count: int, val_field: bytes):
    size = _TYPE_SIZE[typ] * count
    if size <= 4:
        raw = val_field[:size]
    else:
        (off,) = struct.unpack("<I", val_field)
        raw = buf[off:off + size]
    if typ == _T_ASCII:
        return raw.rstrip(b"\x00").decode()
    return list(struct.unpack("<" + _TYPE_FMT[typ] * count, raw))


_DTYPES_BY_FORMAT = {
    (1, 8): "uint8", (2, 8): "int8",
    (1, 16): "uint16", (2, 16): "int16",
    (1, 32): "uint32", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
}


def read_geotiff(path: str, page: int = 0):
    """Parse a TIFF this writer (or any baseline band-planar striped writer)
    produced.  Returns ``(pixels (bands, h, w), meta dict)`` with
    ``transform`` / ``crs_epsg`` / ``nodata`` / ``description`` /
    ``n_pages`` recovered from the tags."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"II*\x00":
        raise ValueError("not a little-endian baseline TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    n_pages = 0
    tags = None
    while ifd_off:
        (n_entries,) = struct.unpack_from("<H", buf, ifd_off)
        cur = {}
        for k in range(n_entries):
            tag, typ, count = struct.unpack_from("<HHI", buf, ifd_off + 2 + 12 * k)
            val_field = buf[ifd_off + 10 + 12 * k: ifd_off + 14 + 12 * k]
            cur[tag] = _read_values(buf, typ, count, val_field)
        if n_pages == page:
            tags = cur
        n_pages += 1
        (ifd_off,) = struct.unpack_from(
            "<I", buf, ifd_off + 2 + 12 * n_entries
        )
    if tags is None:
        raise IndexError(f"page {page} out of range ({n_pages} pages)")

    w, h = tags[_IMAGE_WIDTH][0], tags[_IMAGE_LENGTH][0]
    bands = tags[_SAMPLES_PER_PIXEL][0]
    if tags.get(_PLANAR_CONFIG, [2])[0] != 2:
        raise ValueError("reader supports PlanarConfiguration=2 only")
    bits = tags[_BITS_PER_SAMPLE][0]
    fmt = tags.get(_SAMPLE_FORMAT, [1])[0]
    dtype = np.dtype(_DTYPES_BY_FORMAT[(fmt, bits)])
    compression = tags[_COMPRESSION][0]
    if compression not in (1, 8):
        raise ValueError(f"unsupported compression code {compression}")
    rps = tags[_ROWS_PER_STRIP][0]
    offs, counts = tags[_STRIP_OFFSETS], tags[_STRIP_BYTE_COUNTS]

    strips_per_band = (h + rps - 1) // rps
    out = np.empty((bands, h, w), dtype)
    for b in range(bands):
        row = 0
        for s in range(strips_per_band):
            idx = b * strips_per_band + s
            raw = buf[offs[idx]: offs[idx] + counts[idx]]
            if compression == 8:
                raw = zlib.decompress(raw)
            block = np.frombuffer(raw, dtype).reshape(-1, w)
            out[b, row:row + block.shape[0]] = block
            row += block.shape[0]

    meta = {"n_pages": n_pages, "subfile_type": tags.get(_NEW_SUBFILE_TYPE, [0])[0]}
    if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
        sx, sy, _ = tags[_MODEL_PIXEL_SCALE]
        _, _, _, x0, y1, _ = tags[_MODEL_TIEPOINT]
        meta["transform"] = [sx, 0.0, x0, 0.0, -sy, y1]
    if _GEO_KEY_DIRECTORY in tags:
        gk = tags[_GEO_KEY_DIRECTORY]
        for k in range(gk[3]):
            key, _, _, val = gk[4 + 4 * k: 8 + 4 * k]
            if key in (_PROJECTED_CRS, _GEOGRAPHIC_CRS):
                meta["crs_epsg"] = val
            elif key == _GT_MODEL_TYPE:
                meta["geographic"] = val == 2
    if _GDAL_NODATA in tags:
        meta["nodata"] = float(tags[_GDAL_NODATA])
    if _IMAGE_DESCRIPTION in tags:
        meta["description"] = tags[_IMAGE_DESCRIPTION]
    return out, meta
