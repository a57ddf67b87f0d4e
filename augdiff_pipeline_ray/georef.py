"""Deterministic georeferencing of the hinted image table (SURVEY.md §7.2).

The driver's ``input_hint`` table — ``(image_id, bytes, w, h, fmt, caption, phash)`` — carries
no lat/lon, so the engine derives a *pure, deterministic* footprint per image from ``phash``
alone: low 16 bits position longitude, the next 15 bits latitude, and the pixel dimensions
scale the footprint extent (1 arc-second per pixel). Same phash ⇒ same footprint, always; no
stored geometry needed. The arithmetic is plain integer ops so the DuckDB conformance oracle
can reproduce it in SQL.

Footprint = axis-aligned bbox centered at (lat_c, lon_c), half-extent (h/2, w/2) arcsec.
The tile's cell assignment is the point-in-polygon hit of its centroid at the working
resolution (rectangular cells make centroid-PIP exact; the PIP kernel itself lives in
``functions/geom.py`` and is exercised by the STRtree assignment stage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import cells

ARCSEC = 1.0 / 3600.0  # degrees per pixel of footprint extent


def _np(x, dtype=np.int64) -> np.ndarray:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = x.to_numpy(zero_copy_only=False)
    return np.asarray(x, dtype=dtype)


def centroid(phash) -> tuple[np.ndarray, np.ndarray]:
    """phash → (lat_c, lon_c) degrees. Pure integer → float arithmetic."""
    ph = _np(phash)
    lon = (ph & 0xFFFF).astype(np.float64) / 65536.0 * 360.0 - 180.0
    lat = ((ph >> 16) & 0x7FFF).astype(np.float64) / 32768.0 * 180.0 - 90.0
    return lat, lon


def footprint(phash, w, h) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """phash,w,h → (lat0, lat1, lon0, lon1) bbox arrays (degrees)."""
    lat, lon = centroid(phash)
    dlat = _np(h).astype(np.float64) * ARCSEC / 2.0
    dlon = _np(w).astype(np.float64) * ARCSEC / 2.0
    return lat - dlat, lat + dlat, lon - dlon, lon + dlon


def cell_of_image(phash, res: int = cells.DEFAULT_RES) -> np.ndarray:
    """Primary cell assignment: centroid cell at ``res``."""
    lat, lon = centroid(phash)
    return cells.cell_of(lat, lon, res)


def footprint_polygon(phash: int, w: int, h: int) -> np.ndarray:
    """Single image footprint as a closed (5,2) (lon, lat) ring — for PIP/overlay."""
    lat0, lat1, lon0, lon1 = (float(v[0]) for v in footprint([phash], [w], [h]))
    return np.array(
        [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]],
        dtype=np.float64,
    )
