"""Pixel dtype promotion + nodata — reference semantics from
/root/reference/geedim/image.py:55-73 (nodata table, no int64) and
image.py:304-339 (minimum dtype able to represent all bands).
"""

from __future__ import annotations

import numpy as np

from geedim_spark.codecs import NODATA_VALS

# promotion lattice order (image.py:304-339: smallest dtype that can
# represent every band's range; int64 unsupported upstream and here)
_INT_ORDER = ["uint8", "int8", "uint16", "int16", "uint32", "int32"]


def nodata_for(dtype: str):
    return NODATA_VALS[dtype]


def promote_dtype(dtypes: list[str]) -> str:
    """Minimum dtype able to represent all the given band dtypes.

    Mirrors the reference's promotion: any float -> float64 if float64
    present else float32 widened as needed; ints widen to the smallest type
    whose [min, max] covers the union of ranges; int64 raises (unsupported,
    image.py:66-73).
    """
    if any(d == "int64" or d == "uint64" for d in dtypes):
        raise ValueError("int64/uint64 pixel types are unsupported (image.py:66-73)")
    if any(d.startswith("float") for d in dtypes):
        # floats can represent all int32/uint32 approximately; the reference
        # promotes to the widest float present, float64 if any 32-bit int
        # would lose precision
        if "float64" in dtypes:
            return "float64"
        if any(d in ("int32", "uint32") for d in dtypes):
            return "float64"
        return "float32"
    lo = min(np.iinfo(d).min for d in dtypes)
    hi = max(np.iinfo(d).max for d in dtypes)
    for cand in _INT_ORDER:
        info = np.iinfo(cand)
        if info.min <= lo and info.max >= hi:
            return cand
    raise ValueError(f"no supported dtype covers [{lo}, {hi}]")


def cast_pixels(pixels: np.ndarray, dtype: str) -> np.ndarray:
    """toUint8...toDouble dispatch analog (image.py:571-596): clip to the
    target range then cast (EE semantics saturate rather than wrap).
    Non-finite inputs (NaN marks all-masked composite pixels) become the
    target dtype's nodata — np.clip passes NaN through and NaN.astype(int)
    is undefined (platform-dependent garbage)."""
    if dtype not in NODATA_VALS:
        # the reference's toDType raises on int64/uint64 etc.
        # (test_image.py:254-258 'Unsupported dtype'; image.py:66-73 has no
        # nodata for them) — silently casting here would produce a table
        # whose nodata convention no downstream kernel understands
        raise ValueError(
            f"Unsupported dtype: {dtype!r} (supported: "
            f"{sorted(NODATA_VALS)})"
        )
    dt = np.dtype(dtype)
    if dt.kind in "ui":
        px = pixels
        if np.issubdtype(np.asarray(pixels).dtype, np.floating):
            px = np.where(np.isfinite(pixels), pixels, nodata_for(dtype))
        info = np.iinfo(dt)
        return np.clip(px, info.min, info.max).astype(dt)
    return pixels.astype(dt)
