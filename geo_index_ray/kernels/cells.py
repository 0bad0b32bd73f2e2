"""Hierarchical H3/S2-style cell grid over lon/lat — pure numpy, no deps.

The reference has no cell tiling (its analog is the Hilbert leaf
partitioning, python/src/rtree/partitions.rs:17-132); this module supplies
the cell index the engine's shuffle keys, tiling and raster↔vector
assignment are built on.

Scheme: an equirectangular quadtree.  At resolution ``r`` the world
(lon ∈ [-180, 180), lat ∈ [-90, 90)) is a 2^r × 2^r grid.  A cell id packs
``(resolution, ix, iy)`` into an int64:

    cell_id = (r << 58) | (ix << 29) | iy          (r ≤ 29, ix/iy < 2^29)

For a *fixed* resolution the SQL-oracle-friendly flat id is
``flat_id = ix * 2^r + iy`` (see ``flat_cell_id``), exactly expressible in
DuckDB as ``CAST(FLOOR((lon+180)/360*2^r) AS BIGINT) * 2^r +
CAST(FLOOR((lat+90)/180*2^r) AS BIGINT)``.

All functions are vectorized over numpy arrays and deterministic.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29
_RES_SHIFT = 58
_IX_SHIFT = 29
_MASK = (1 << 29) - 1


def _grid_n(res: int) -> int:
    return 1 << res


def lonlat_to_cell_xy(lon, lat, res: int):
    """(ix, iy) grid coordinates at resolution ``res`` (int64 arrays)."""
    n = _grid_n(res)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    # clamp the closed upper edge (lon=180 / lat=90) into the last cell
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return ix, iy


def pack_cell(res: int, ix, iy):
    return (
        (np.int64(res) << np.int64(_RES_SHIFT))
        | (np.asarray(ix, dtype=np.int64) << np.int64(_IX_SHIFT))
        | np.asarray(iy, dtype=np.int64)
    )


def unpack_cell(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(_RES_SHIFT)).astype(np.int64)
    ix = (cell >> np.int64(_IX_SHIFT)) & np.int64(_MASK)
    iy = cell & np.int64(_MASK)
    return res, ix, iy


def lonlat_to_cell(lon, lat, res: int):
    """Packed hierarchical cell id for point(s)."""
    ix, iy = lonlat_to_cell_xy(lon, lat, res)
    return pack_cell(res, ix, iy)


def flat_cell_id(lon, lat, res: int):
    """SQL-oracle-friendly flat id at fixed res: ``ix * 2^res + iy``."""
    ix, iy = lonlat_to_cell_xy(lon, lat, res)
    return ix * np.int64(_grid_n(res)) + iy


def cell_bounds(cell):
    """(min_lon, min_lat, max_lon, max_lat) of packed cell id(s)."""
    res, ix, iy = unpack_cell(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w = 360.0 / n
    h = 180.0 / n
    min_lon = -180.0 + ix * w
    min_lat = -90.0 + iy * h
    return min_lon, min_lat, min_lon + w, min_lat + h


def cell_polygon(cell_scalar: int) -> np.ndarray:
    """(5, 2) closed ring (lon, lat) of a single cell — the tile polygon."""
    mnx, mny, mxx, mxy = cell_bounds(np.asarray([cell_scalar]))
    mnx, mny, mxx, mxy = float(mnx[0]), float(mny[0]), float(mxx[0]), float(mxy[0])
    return np.array(
        [[mnx, mny], [mxx, mny], [mxx, mxy], [mnx, mxy], [mnx, mny]], dtype=np.float64
    )


def cell_parent(cell, parent_res: int):
    res, ix, iy = unpack_cell(cell)
    shift = res - np.int64(parent_res)
    return pack_cell(parent_res, ix >> shift, iy >> shift)


def cell_children(cell_scalar: int) -> np.ndarray:
    """The four children of a cell at res+1."""
    res, ix, iy = unpack_cell(np.asarray([cell_scalar]))
    r, x, y = int(res[0]) + 1, int(ix[0]) << 1, int(iy[0]) << 1
    xs = np.array([x, x + 1, x, x + 1], dtype=np.int64)
    ys = np.array([y, y, y + 1, y + 1], dtype=np.int64)
    return pack_cell(r, xs, ys)


def cell_ring(cell_scalar: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)² block, incl. self).

    Longitude wraps; latitude clips at the poles.
    """
    res, ix, iy = unpack_cell(np.asarray([cell_scalar]))
    r, x, y = int(res[0]), int(ix[0]), int(iy[0])
    n = _grid_n(r)
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    xs = (x + dx.ravel()) % n
    ys = y + dy.ravel()
    ok = (ys >= 0) & (ys < n)
    return np.unique(pack_cell(r, xs[ok], ys[ok]))


def polyfill_boxes(min_lon, min_lat, max_lon, max_lat, res: int):
    """For each bbox, the list of cells it overlaps.

    Returns ``(row_ids, cell_ids)`` — row ``row_ids[k]`` overlaps cell
    ``cell_ids[k]``.  This is the halo-replication primitive: a geometry is
    shipped to every cell it touches so per-cell joins are complete; dedup
    pairs downstream.  Vectorized via per-box cell-count expansion.
    """
    n = _grid_n(res)
    min_lon = np.asarray(min_lon, dtype=np.float64)
    min_lat = np.asarray(min_lat, dtype=np.float64)
    max_lon = np.asarray(max_lon, dtype=np.float64)
    max_lat = np.asarray(max_lat, dtype=np.float64)
    x0, y0 = lonlat_to_cell_xy(min_lon, min_lat, res)
    x1, y1 = lonlat_to_cell_xy(max_lon, max_lat, res)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    counts = (nx * ny).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    cum = np.cumsum(counts) - counts
    local = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    lx = local // np.repeat(ny, counts)
    ly = local % np.repeat(ny, counts)
    xs = np.repeat(x0, counts) + lx
    ys = np.repeat(y0, counts) + ly
    np.clip(xs, 0, n - 1, out=xs)
    np.clip(ys, 0, n - 1, out=ys)
    return rows, pack_cell(res, xs, ys)


def cell_to_flat(cell):
    """Packed cell id → flat id ``ix * 2^res + iy`` (res from the id)."""
    res, ix, iy = unpack_cell(cell)
    return ix * (np.int64(1) << res) + iy


def flat_to_cell(flat, res: int):
    flat = np.asarray(flat, dtype=np.int64)
    n = np.int64(_grid_n(res))
    return pack_cell(res, flat // n, flat % n)
