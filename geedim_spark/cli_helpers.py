"""CLI support helpers kept import-light (no Spark at module import).

``geojson_bounds`` backs the reference CLI's ``-r/--region`` option
(cli.py:257-268 -> geedim resolves a GeoJSON file to export bounds): the
engine's regions are bbox ROIs, so the polygon collapses to its bounds
via the numpy geometry kernel.
"""

from __future__ import annotations

import json

import numpy as np

from geedim_spark import geometry


def _rings(obj: dict) -> list[list[list[float]]]:
    t = obj.get("type")
    if t == "FeatureCollection":
        out = []
        for f in obj.get("features", []):
            out.extend(_rings(f))
        return out
    if t == "Feature":
        return _rings(obj.get("geometry") or {})
    if t == "Polygon":
        return [obj["coordinates"][0]]
    if t == "MultiPolygon":
        return [poly[0] for poly in obj["coordinates"]]
    raise ValueError(
        f"unsupported GeoJSON type {t!r} (Polygon / MultiPolygon / "
        "Feature / FeatureCollection)"
    )


def geojson_bounds(path: str) -> tuple[float, float, float, float]:
    """(x0, y0, x1, y1) bounds of the outer ring(s) in a GeoJSON file."""
    with open(path) as f:
        obj = json.load(f)
    rings = _rings(obj)
    if not rings:
        raise ValueError(f"{path}: no polygon geometry found")
    pts = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings])
    x0, y0, x1, y1 = geometry.polygon_bounds(pts)
    return x0, y0, x1, y1
