"""Hierarchical grid cell index (H3/S2-style) — pure Spark + numpy, no deps.

The reference delegates spatial indexing to the Earth Engine service
(``filterBounds``, /root/reference/geedim/collection.py:601-602).  Our engine
owns it: image footprints and ROI geometries are covered with cells of a
fixed quadtree grid, and the spatial join becomes a plain equi-join on
``cell`` (see :mod:`geedim_spark.operators.spatial_join`) followed by an
exact geometric refinement.  This is the standard S2/H3 cover-join pattern;
since neither library ships in this environment the index is a
bit-concatenated (quadkey-equivalent) grid over a configurable planar extent:

    ix = floor((x - x0) / world * 2^res)   clamped to [0, 2^res - 1]
    iy = floor((y - y0) / world * 2^res)
    cell = ix * 2^res + iy                 (int64; res <= 30)

Properties: deterministic, exactly invertible, hierarchical
(``parent = (ix >> d) * 2^(res-d) + (iy >> d)``), SQL-expressible — the
DuckDB oracle computes the identical ids with integer arithmetic.

All column-side functions are Catalyst expressions (sequence/transform/
flatten) — cell covering and kRing expansion never leave the JVM.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Planar test world.  Power-of-two size keeps cell widths exact binary
# fractions so float -> int grid math is reproducible bit-for-bit in SQL.
WORLD_X0 = 0.0
WORLD_Y0 = 0.0
WORLD_SIZE = 102400.0  # metres
DEFAULT_RES = 7  # 128 x 128 cells of 800 m


def cell_width(res: int = DEFAULT_RES) -> float:
    return WORLD_SIZE / (1 << res)


# ---------------------------------------------------------------------------
# numpy side (used inside pixel kernels + tests)
# ---------------------------------------------------------------------------

def np_cell_index(coord: np.ndarray, origin: float, res: int) -> np.ndarray:
    n = 1 << res
    ix = np.floor((np.asarray(coord, dtype=np.float64) - origin) / WORLD_SIZE * n)
    return np.clip(ix, 0, n - 1).astype(np.int64)


def np_cell(x: np.ndarray, y: np.ndarray, res: int = DEFAULT_RES) -> np.ndarray:
    ix = np_cell_index(x, WORLD_X0, res)
    iy = np_cell_index(y, WORLD_Y0, res)
    return ix * (1 << res) + iy


def np_cover_bbox(x0, y0, x1, y1, res: int = DEFAULT_RES) -> np.ndarray:
    """All cells intersecting the closed bbox (vectorised per single bbox)."""
    ix0, ix1 = np_cell_index(np.array([x0, x1]), WORLD_X0, res)
    iy0, iy1 = np_cell_index(np.array([y0, y1]), WORLD_Y0, res)
    ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    return (ix[:, None] * (1 << res) + iy[None, :]).ravel()


def np_kring(cell: int, k: int, res: int = DEFAULT_RES) -> np.ndarray:
    """Cells within Chebyshev distance k (incl. centre), clipped to world."""
    n = 1 << res
    ix, iy = divmod(int(cell), n)
    xs = np.arange(max(0, ix - k), min(n - 1, ix + k) + 1, dtype=np.int64)
    ys = np.arange(max(0, iy - k), min(n - 1, iy + k) + 1, dtype=np.int64)
    return (xs[:, None] * n + ys[None, :]).ravel()


def np_parent(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    d = res - parent_res
    n = 1 << res
    ix, iy = np.divmod(np.asarray(cell, dtype=np.int64), n)
    return (ix >> d) * (1 << parent_res) + (iy >> d)


# ---------------------------------------------------------------------------
# Spark column side (JVM expressions; whole-stage-codegen friendly)
# ---------------------------------------------------------------------------

def col_cell_index(coord: Column, origin: float, res: int) -> Column:
    n = 1 << res
    raw = F.floor((coord - F.lit(origin)) / F.lit(WORLD_SIZE) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def col_cell(x: Column, y: Column, res: int = DEFAULT_RES) -> Column:
    ix = col_cell_index(x, WORLD_X0, res)
    iy = col_cell_index(y, WORLD_Y0, res)
    return (ix * F.lit(1 << res) + iy).alias("cell")


def col_cover_bbox(x0: Column, y0: Column, x1: Column, y1: Column,
                   res: int = DEFAULT_RES) -> Column:
    """array<long> of cells covering the bbox — pure sequence/transform."""
    n = F.lit(1 << res)
    ix0 = col_cell_index(x0, WORLD_X0, res)
    ix1 = col_cell_index(x1, WORLD_X0, res)
    iy0 = col_cell_index(y0, WORLD_Y0, res)
    iy1 = col_cell_index(y1, WORLD_Y0, res)
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda ix: F.transform(F.sequence(iy0, iy1), lambda iy: ix * n + iy),
        )
    )


def col_kring(cell: Column, k: int, res: int = DEFAULT_RES) -> Column:
    """array<long> of cells within Chebyshev distance k, clipped to world.

    Realises the reference's directional/distance neighbourhood reach
    (mask.py:331-372 shadow projection; mask.py:88-124 cloud distance) as a
    neighbour-cell table: the stencil halo join is an equi-join against the
    exploded kRing.
    """
    n = F.lit(1 << res)
    nmax = F.lit((1 << res) - 1)
    ix = (cell / n).cast("long")
    iy = cell % n
    dxs = F.sequence(F.lit(-k), F.lit(k))
    return F.flatten(
        F.transform(
            dxs,
            lambda dx: F.filter(
                F.transform(
                    F.sequence(F.lit(-k), F.lit(k)),
                    lambda dy: F.when(
                        (ix + dx >= 0) & (ix + dx <= nmax)
                        & (iy + dy >= 0) & (iy + dy <= nmax),
                        (ix + dx) * n + (iy + dy),
                    ),
                ),
                lambda c: c.isNotNull(),
            ),
        )
    )


def sql_cell_index(coord_expr: str, origin: float, res: int) -> str:
    """DuckDB-compatible SQL producing the identical cell index (oracle)."""
    n = 1 << res
    return (
        f"greatest(0, least({n - 1}, "
        f"cast(floor(({coord_expr} - {origin}) / {WORLD_SIZE} * {n}) as bigint)))"
    )


def sql_cell(x_expr: str, y_expr: str, res: int = DEFAULT_RES) -> str:
    n = 1 << res
    return (
        f"({sql_cell_index(x_expr, WORLD_X0, res)} * {n} "
        f"+ {sql_cell_index(y_expr, WORLD_Y0, res)})"
    )
