"""Vectorized scalar kernels — the engine's analogue of the reference's Spark UDF surface.

Mapping (SURVEY.md §2.2): larger (Common.scala:74), getInstant (Common.scala:76),
asDouble/asFloat (functions/package.scala:17-25), ST_Point / ST_AsText / ST_IsEmpty /
ST_IsValid (functions/package.scala:27-46), ST_Transform LatLng→WebMercator
(functions/package.scala:12-13,48-50 — implemented directly from the spherical-mercator
formula; no pyproj in this container).

All kernels take/return numpy or pyarrow arrays and are intended for use inside
``map_batches(..., batch_format="pyarrow")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import geom as G

WEB_MERCATOR_R = 6378137.0


def larger(x, y):
    """Elementwise max of two int64 columns."""
    return pc.max_element_wise(x, y)


def get_instant(ts) -> pa.Array:
    """timestamp → epoch millis (int64)."""
    if isinstance(ts, (pa.Array, pa.ChunkedArray)):
        t = ts.cast(pa.timestamp("ms"))
        return t.cast(pa.int64())
    return pa.array(np.asarray(ts, dtype="datetime64[ms]").astype(np.int64))


def as_double(x) -> pa.Array:
    """decimal/any-numeric → float64, null → NaN."""
    arr = x if isinstance(x, (pa.Array, pa.ChunkedArray)) else pa.array(x)
    return pc.coalesce(arr.cast(pa.float64()), pa.scalar(float("nan"), pa.float64()))


def as_float(x) -> pa.Array:
    arr = x if isinstance(x, (pa.Array, pa.ChunkedArray)) else pa.array(x)
    return pc.coalesce(arr.cast(pa.float32()), pa.scalar(float("nan"), pa.float32()))


def st_point(lon, lat) -> list[bytes | None]:
    """(x, y) float arrays → WKB point per row; NaN/null → None."""
    lon = np.asarray(
        lon.to_numpy(zero_copy_only=False) if isinstance(lon, (pa.Array, pa.ChunkedArray)) else lon,
        dtype=np.float64,
    )
    lat = np.asarray(
        lat.to_numpy(zero_copy_only=False) if isinstance(lat, (pa.Array, pa.ChunkedArray)) else lat,
        dtype=np.float64,
    )
    bad = np.isnan(lon) | np.isnan(lat)
    return [None if b else G.point_wkb(x, y) for x, y, b in zip(lon, lat, bad)]


def st_as_text(wkbs) -> list[str | None]:
    return [None if w is None else G.geom_to_wkt(G.wkb_to_geom(w)) for w in _pylist(wkbs)]


def st_is_empty(wkbs) -> list[bool]:
    return [G.is_empty(G.wkb_to_geom(w)) if w is not None else True for w in _pylist(wkbs)]


def st_is_valid(wkbs) -> list[bool]:
    return [G.is_valid(G.wkb_to_geom(w)) if w is not None else False for w in _pylist(wkbs)]


def lonlat_to_web_mercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857, vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.radians(lon) * WEB_MERCATOR_R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * WEB_MERCATOR_R
    return x, y


def st_transform_point_wkb(wkbs) -> list[bytes | None]:
    """Reproject WKB points LatLng→WebMercator (the reference's only ST_Transform use)."""
    out: list[bytes | None] = []
    for w in _pylist(wkbs):
        if w is None:
            out.append(None)
            continue
        g = G.wkb_to_geom(w)
        if g is None or g[0] != "Point":
            out.append(None)
            continue
        x, y = lonlat_to_web_mercator([g[1][0]], [g[1][1]])
        out.append(G.point_wkb(float(x[0]), float(y[0])))
    return out


def _pylist(x):
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x.to_pylist()
    return list(x)
