"""Purpose-built hierarchical spatial cell index (H3/S2-style, pure numpy).

Generalizes the reference's bounded partition fn (common/src/main/scala/Common.scala:59-72)
into a *spatial* partition key with real locality: at resolution ``r`` the lat/lon globe is a
regular grid of ``2^r`` rows × ``2^(r+1)`` columns (square-ish cells; res 8 → 256×512 cells,
≈0.70°×0.70°). Cell ids are a single int64:

    cell = (res << 50) | (row << 25) | col

which keeps the whole hierarchy addressable in one integer column (the engine's partition /
shuffle / lineage key everywhere), is order-preserving within a resolution, and — at a fixed
resolution — is expressible in plain SQL arithmetic (used by the DuckDB conformance oracles).

Hierarchy: ``parent`` halves row/col; ``children`` enumerates the 2×2 block plus the extra
column split; ``k_ring`` gives the (2k+1)² neighborhood with longitude wraparound and
latitude clamping — the kNN search set.

Everything is vectorized numpy, safe inside ``map_batches`` hot loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RES_SHIFT = 50
ROW_SHIFT = 25
ROW_MASK = (1 << 25) - 1
# The engine's working resolution — the "H3 res-8" analogue BY CELL SIZE: grid res 15
# gives 0.0055° × 0.0055° cells (~611 m × 611 m at the equator), comparable to H3 res 8
# (~461 m edge). Grid-res numbers are not H3 res numbers.
DEFAULT_RES = 15
MAX_RES = 24


def _np(x, dtype=None) -> np.ndarray:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = x.to_numpy(zero_copy_only=False)
    return np.asarray(x) if dtype is None else np.asarray(x, dtype=dtype)


def grid_shape(res: int) -> tuple[int, int]:
    """(n_rows, n_cols) at resolution ``res``."""
    return (1 << res, 1 << (res + 1))


def cell_of(lat, lon, res: int = DEFAULT_RES) -> np.ndarray:
    """lat/lon (degrees, float arrays) → cell id at ``res``. NaN → -1."""
    lat = _np(lat, np.float64)
    lon = _np(lon, np.float64)
    bad = np.isnan(lat) | np.isnan(lon)
    nrows, ncols = grid_shape(res)
    row = np.floor(np.nan_to_num((lat + 90.0) / 180.0 * nrows)).astype(np.int64)
    col = np.floor(np.nan_to_num((lon + 180.0) / 360.0 * ncols)).astype(np.int64)
    np.clip(row, 0, nrows - 1, out=row)
    # longitude wraps
    col = np.mod(col, ncols)
    cell = (np.int64(res) << RES_SHIFT) | (row << ROW_SHIFT) | col
    if bad.any():
        cell = np.where(bad, np.int64(-1), cell)
    return cell


def cell_res(cells) -> np.ndarray:
    return _np(cells, np.int64) >> RES_SHIFT


def cell_row(cells) -> np.ndarray:
    return (_np(cells, np.int64) >> ROW_SHIFT) & ROW_MASK


def cell_col(cells) -> np.ndarray:
    return _np(cells, np.int64) & ROW_MASK


def make_cell(res, row, col) -> np.ndarray:
    return (
        (_np(res, np.int64) << RES_SHIFT)
        | (_np(row, np.int64) << ROW_SHIFT)
        | _np(col, np.int64)
    )


def parent(cells, parent_res: int | None = None) -> np.ndarray:
    """Parent cell one level up (or at ``parent_res``)."""
    cells = _np(cells, np.int64)
    res = cell_res(cells)
    pres = res - 1 if parent_res is None else np.full_like(res, parent_res)
    shift = res - pres
    return make_cell(pres, cell_row(cells) >> shift, cell_col(cells) >> shift)


def children(cell: int) -> np.ndarray:
    """One level down each cell splits into 2 rows × 2 cols = 4 children."""
    res = int(cell) >> RES_SHIFT
    r0, c0 = (int(cell) >> ROW_SHIFT) & ROW_MASK, int(cell) & ROW_MASK
    rows = np.repeat([2 * r0, 2 * r0 + 1], 2)
    cols = np.tile([2 * c0, 2 * c0 + 1], 2)
    return make_cell(np.full(4, res + 1), rows, cols)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. self): the kNN candidate neighborhood.

    Longitude wraps mod n_cols; rows outside [0, n_rows) are dropped (polar clamp).
    """
    res = int(cell) >> RES_SHIFT
    nrows, ncols = grid_shape(res)
    r0 = (int(cell) >> ROW_SHIFT) & ROW_MASK
    c0 = int(cell) & ROW_MASK
    rr, cc = np.meshgrid(np.arange(r0 - k, r0 + k + 1), np.arange(c0 - k, c0 + k + 1))
    rr, cc = rr.ravel(), cc.ravel()
    keep = (rr >= 0) & (rr < nrows)
    rr, cc = rr[keep], np.mod(cc[keep], ncols)
    return np.unique(make_cell(np.full(rr.shape, res), rr, cc))


def cell_bounds(cells) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell ids → (lat_min, lat_max, lon_min, lon_max) arrays (degrees)."""
    cells = _np(cells, np.int64)
    res = cell_res(cells)
    nrows = (np.int64(1) << res).astype(np.float64)
    ncols = nrows * 2
    row = cell_row(cells).astype(np.float64)
    col = cell_col(cells).astype(np.float64)
    lat0 = row / nrows * 180.0 - 90.0
    lat1 = (row + 1) / nrows * 180.0 - 90.0
    lon0 = col / ncols * 360.0 - 180.0
    lon1 = (col + 1) / ncols * 360.0 - 180.0
    return lat0, lat1, lon0, lon1


def cell_polygon(cell: int) -> np.ndarray:
    """Cell boundary as a closed (5,2) array of (lon, lat) — for PIP tests."""
    lat0, lat1, lon0, lon1 = (float(v) for v in cell_bounds(np.array([cell])))
    return np.array(
        [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]],
        dtype=np.float64,
    )


def cells_covering_bbox(lat0, lat1, lon0, lon1, res: int = DEFAULT_RES) -> np.ndarray:
    """All cells at ``res`` intersecting the bbox (scalar bounds) — a tiny S2-style cover."""
    nrows, ncols = grid_shape(res)
    r0 = max(0, int(np.floor((lat0 + 90.0) / 180.0 * nrows)))
    r1 = min(nrows - 1, int(np.floor((lat1 + 90.0) / 180.0 * nrows)))
    c0 = int(np.floor((lon0 + 180.0) / 360.0 * ncols))
    c1 = int(np.floor((lon1 + 180.0) / 360.0 * ncols))
    rr, cc = np.meshgrid(np.arange(r0, r1 + 1), np.arange(c0, c1 + 1))
    rr, cc = rr.ravel(), np.mod(cc.ravel(), ncols)
    return np.unique(make_cell(np.full(rr.shape, res), rr, cc))
