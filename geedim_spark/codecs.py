"""Image codecs: ``raw`` (bit-exact) and ``dct8`` (deterministic lossy).

The reference moves pixels as GeoTIFF tiles decoded with rasterio
(/root/reference/geedim/tile.py:343-346).  No raster codec library ships in
this environment, so the engine defines its own wire formats for the
``bytes`` column of the images table:

- ``raw``  : header + C-order band-interleaved buffer.  Bit-exact round trip
  — backs every exact-count oracle.
- ``dct8`` : self-implemented 8x8 block-DCT with uniform quantisation
  ("jpeg-like").  Deterministic across numpy versions (pure float64 matmul +
  rint) and decodes at PSNR >= 40 dB, exercising the lossy-pixel invariant
  from BASELINE.json ``input_hint``.

Both are numpy-vectorised and called only from Arrow-batched pandas UDFs —
never per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_RAW = b"GDR1"
MAGIC_DCT = b"GDD2"      # int32 coefficients
MAGIC_DCT_V1 = b"GDD1"   # legacy int16 coefficients (read-only)

# dtype codes on the wire (mirrors the reference's supported pixel types,
# image.py:55-64; int64 unsupported there and here)
_DTYPES = ["uint8", "int8", "uint16", "int16", "uint32", "int32", "float32", "float64"]
_DTYPE_CODE = {d: i for i, d in enumerate(_DTYPES)}

# fixed nodata per dtype — same values as the reference (image.py:55-64)
NODATA_VALS = {
    "uint8": 0,
    "int8": -(2**7),
    "uint16": 0,
    "int16": -(2**15),
    "uint32": 0,
    "int32": -(2**31),
    "float32": float("-inf"),
    "float64": float("-inf"),
}

_HDR = struct.Struct("<4sBBHH")  # magic, dtype code, bands, h, w

# dtype-OBJECT-keyed twin of _DTYPE_CODE: ``arr.dtype.name`` goes through
# numpy's _name_get property (~7 us) — at one encode per exported tile that
# was a third of the encode cost; np.dtype hashing is a few ns
_DTYPE_CODE_BY_DTYPE = {np.dtype(d): i for i, d in enumerate(_DTYPES)}


def encode_raw(pixels: np.ndarray) -> bytes:
    """``pixels`` shaped (bands, h, w) -> raw buffer."""
    pixels = np.ascontiguousarray(pixels)
    bands, h, w = pixels.shape
    code = _DTYPE_CODE_BY_DTYPE.get(pixels.dtype)
    if code is None:
        code = _DTYPE_CODE[pixels.dtype.name]  # KeyError: unsupported dtype
    hdr = _HDR.pack(MAGIC_RAW, code, bands, h, w)
    return hdr + pixels.tobytes()


def decode(buf: bytes) -> np.ndarray:
    """Decode either format -> (bands, h, w) ndarray."""
    magic, code, bands, h, w = _HDR.unpack_from(buf, 0)
    if magic == MAGIC_RAW:
        dt = np.dtype(_DTYPES[code])
        arr = np.frombuffer(buf, dtype=dt, offset=_HDR.size, count=bands * h * w)
        return arr.reshape(bands, h, w).copy()
    if magic == MAGIC_DCT:
        return _decode_dct8(buf, code, bands, h, w)
    if magic == MAGIC_DCT_V1:
        return _decode_dct8(buf, code, bands, h, w, coef_dtype=np.int16)
    raise ValueError(f"unknown image magic {magic!r}")


# ---------------------------------------------------------------------------
# dct8 — deterministic lossy codec
# ---------------------------------------------------------------------------

_N = 8


def _dct_matrix() -> np.ndarray:
    k = np.arange(_N, dtype=np.float64)
    mat = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * _N))
    mat *= np.sqrt(2.0 / _N)
    mat[0] /= np.sqrt(2.0)
    return mat


_DCT = _dct_matrix()
_QSTEP = 2.0  # uniform quantisation step -> PSNR ~48 dB on uint8 content


def encode_dct8(pixels: np.ndarray) -> bytes:
    """(bands, h, w) integer pixels -> quantised block-DCT buffer."""
    bands, h, w = pixels.shape
    hp, wp = -(-h // _N) * _N, -(-w // _N) * _N
    padded = np.zeros((bands, hp, wp), dtype=np.float64)
    padded[:, :h, :w] = pixels
    # edge-replicate padding keeps boundary blocks smooth
    padded[:, h:, :w] = padded[:, h - 1 : h, :w]
    padded[:, :, w:] = padded[:, :, w - 1 : w]
    blocks = padded.reshape(bands, hp // _N, _N, wp // _N, _N).transpose(0, 1, 3, 2, 4)
    coef = np.einsum("ij,bkljm,nm->bklin", _DCT, blocks, _DCT)
    # int32 coefficients: the DC term of an 8x8 block is 8*mean/QSTEP —
    # int16 clipped (silently corrupting) any block with mean > ~8192,
    # i.e. ordinary bright uint16 imagery; int32 holds the full dtype range
    q = np.rint(coef / _QSTEP).astype(np.int32)
    hdr = _HDR.pack(MAGIC_DCT, _DTYPE_CODE[pixels.dtype.name], bands, h, w)
    return hdr + q.tobytes()


def _decode_dct8(buf: bytes, code: int, bands: int, h: int, w: int,
                 coef_dtype=np.int32) -> np.ndarray:
    hp, wp = -(-h // _N) * _N, -(-w // _N) * _N
    nb = bands * (hp // _N) * (wp // _N) * _N * _N
    q = np.frombuffer(buf, dtype=coef_dtype, offset=_HDR.size, count=nb)
    q = q.reshape(bands, hp // _N, wp // _N, _N, _N).astype(np.float64) * _QSTEP
    blocks = np.einsum("ij,bklin,nm->bkljm", _DCT, q, _DCT)
    padded = blocks.transpose(0, 1, 3, 2, 4).reshape(bands, hp, wp)
    out = padded[:, :h, :w]
    dt = np.dtype(_DTYPES[code])
    if dt.kind in "ui":
        info = np.iinfo(dt)
        out = np.clip(np.rint(out), info.min, info.max)
    return out.astype(dt)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "dct8":
        return encode_dct8(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-style hash: 8x8 mean-threshold bits
    of the first band's block means (signed int64 for Spark LongType)."""
    b0 = pixels[0].astype(np.float64)
    h, w = b0.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    means = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blk = b0[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            means[i, j] = blk.mean() if blk.size else 0.0
    bits = (means > means.mean()).ravel()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    # fold a coarse intensity term in so flat images of different value differ
    val ^= (int(round(means.mean() * 16.0)) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
    return val - (1 << 64) if val >= (1 << 63) else val
