"""Minimal planar geometry kernel: WKB codec, WKT, predicates, point-in-polygon.

This container has no shapely/GEOS, so the engine carries its own small geometry layer —
exactly the pieces the reference uses (JTS via GeoTrellis: points, lines, polygons,
multi-geoms, collections; WKB/WKT encode; validity/emptiness; containment for multipolygon
ring classification — ingest/src/main/scala/osmesa/functions/package.scala:27-46,
osm/package.scala:512-537). Coordinates are numpy (N,2) float64 arrays of (lon, lat)
(equivalent to JTS CoordinateSequences; slicing/[::-1] views replace the reference's
Virtual/Reversed CoordinateSequence rope machinery, osm/package.scala:210-398).

Geometry model (lightweight tagged tuples, no classes to keep Arrow/pickle friction zero):

    ("Point", (2,) array)            ("LineString", (N,2) array)
    ("Polygon", [ring0, ring1...])   rings are closed (N,2) arrays, ring0 = exterior
    ("MultiLineString", [arrays])    ("MultiPolygon", [[rings], ...])
    ("GeometryCollection", [geoms])  None = missing geometry

WKB is little-endian ISO WKB (type codes 1-7), byte-compatible with shapely/GEOS/DuckDB
spatial readers.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

# ---------------------------------------------------------------------------
# WKB encode
# ---------------------------------------------------------------------------


def _hdr(code: int) -> bytes:
    return struct.pack("<BI", 1, code)


def _coords_bytes(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype="<f8")
    return struct.pack("<I", len(a)) + a.tobytes()


def point_wkb(lon: float, lat: float) -> bytes:
    return _hdr(WKB_POINT) + struct.pack("<dd", lon, lat)


def linestring_wkb(coords: np.ndarray) -> bytes:
    return _hdr(WKB_LINESTRING) + _coords_bytes(coords)


def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    body = struct.pack("<I", len(rings)) + b"".join(_coords_bytes(r) for r in rings)
    return _hdr(WKB_POLYGON) + body


def multilinestring_wkb(lines: list[np.ndarray]) -> bytes:
    body = struct.pack("<I", len(lines)) + b"".join(linestring_wkb(l) for l in lines)
    return _hdr(WKB_MULTILINESTRING) + body


def multipolygon_wkb(polys: list[list[np.ndarray]]) -> bytes:
    body = struct.pack("<I", len(polys)) + b"".join(polygon_wkb(p) for p in polys)
    return _hdr(WKB_MULTIPOLYGON) + body


def collection_wkb(wkbs: list[bytes]) -> bytes:
    body = struct.pack("<I", len(wkbs)) + b"".join(wkbs)
    return _hdr(WKB_GEOMETRYCOLLECTION) + body


def geom_to_wkb(geom) -> bytes | None:
    if geom is None:
        return None
    kind, payload = geom
    if kind == "Point":
        return point_wkb(float(payload[0]), float(payload[1]))
    if kind == "LineString":
        return linestring_wkb(payload)
    if kind == "Polygon":
        return polygon_wkb(payload)
    if kind == "MultiLineString":
        return multilinestring_wkb(payload)
    if kind == "MultiPolygon":
        return multipolygon_wkb(payload)
    if kind == "GeometryCollection":
        return collection_wkb([geom_to_wkb(g) for g in payload if g is not None])
    raise ValueError(f"unknown geometry kind {kind}")


# ---------------------------------------------------------------------------
# WKB decode
# ---------------------------------------------------------------------------


def _rd_coords(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr.copy(), off + 16 * n


def _decode(buf: memoryview, off: int):
    endian, code = struct.unpack_from("<BI", buf, off)
    if endian != 1:
        raise ValueError("big-endian WKB unsupported")
    off += 5
    if code == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return ("Point", np.array([x, y])), off + 16
    if code == WKB_LINESTRING:
        arr, off = _rd_coords(buf, off)
        return ("LineString", arr), off
    if code == WKB_POLYGON:
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            r, off = _rd_coords(buf, off)
            rings.append(r)
        return ("Polygon", rings), off
    if code in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION, WKB_MULTIPOINT):
        (ng,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(ng):
            g, off = _decode(buf, off)
            parts.append(g)
        if code == WKB_MULTILINESTRING:
            return ("MultiLineString", [p[1] for p in parts]), off
        if code == WKB_MULTIPOLYGON:
            return ("MultiPolygon", [p[1] for p in parts]), off
        if code == WKB_MULTIPOINT:
            return ("MultiPoint", [p[1] for p in parts]), off
        return ("GeometryCollection", parts), off
    raise ValueError(f"unknown WKB type {code}")


def wkb_to_geom(wkb: bytes | None):
    if wkb is None:
        return None
    geom, _ = _decode(memoryview(wkb), 0)
    return geom


def geojson_to_geom(gj: dict | None):
    """GeoJSON geometry dict → the engine's tagged-tuple geometry model."""
    if gj is None:
        return None
    t = gj["type"]
    if t == "Point":
        return ("Point", np.asarray(gj["coordinates"], float))
    if t == "LineString":
        return ("LineString", np.asarray(gj["coordinates"], float))
    if t == "Polygon":
        return ("Polygon", [np.asarray(r, float) for r in gj["coordinates"]])
    if t == "MultiLineString":
        return ("MultiLineString", [np.asarray(l, float) for l in gj["coordinates"]])
    if t == "MultiPolygon":
        return ("MultiPolygon", [[np.asarray(r, float) for r in p] for p in gj["coordinates"]])
    if t == "GeometryCollection":
        subs = [geojson_to_geom(g) for g in gj["geometries"]]
        return ("GeometryCollection", [s for s in subs if s is not None])
    return None


# ---------------------------------------------------------------------------
# WKT (for ST_AsText parity)
# ---------------------------------------------------------------------------


def _fmt_num(x: float) -> str:
    return f"{x:.10g}"


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in arr)


def geom_to_wkt(geom) -> str:
    if geom is None:
        return "GEOMETRY EMPTY"
    kind, payload = geom
    if kind == "Point":
        return f"POINT ({_fmt_num(payload[0])} {_fmt_num(payload[1])})"
    if kind == "LineString":
        return f"LINESTRING ({_fmt_coords(payload)})"
    if kind == "Polygon":
        inner = ", ".join(f"({_fmt_coords(r)})" for r in payload)
        return f"POLYGON ({inner})"
    if kind == "MultiLineString":
        inner = ", ".join(f"({_fmt_coords(l)})" for l in payload)
        return f"MULTILINESTRING ({inner})"
    if kind == "MultiPolygon":
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in p) + ")" for p in payload
        )
        return f"MULTIPOLYGON ({inner})"
    if kind == "GeometryCollection":
        inner = ", ".join(geom_to_wkt(g) for g in payload)
        return f"GEOMETRYCOLLECTION ({inner})"
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


def is_empty(geom) -> bool:
    if geom is None:
        return True
    kind, payload = geom
    if kind == "Point":
        return bool(np.isnan(payload).any())
    if kind in ("LineString",):
        return len(payload) == 0
    if kind in ("Polygon", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        return len(payload) == 0
    return False


def is_valid(geom) -> bool:
    """Cheap structural validity: ring closure + minimum point counts.

    (The reference delegates to JTS `isValid`; full O(n log n) self-intersection checking
    is out of scope — closure + cardinality is what the pipeline's own geometries exercise.)
    """
    if geom is None:
        return False
    kind, payload = geom
    if kind == "Point":
        return not np.isnan(payload).any()
    if kind == "LineString":
        return len(payload) >= 2
    if kind == "Polygon":
        return all(len(r) >= 4 and np.allclose(r[0], r[-1]) for r in payload) and bool(payload)
    if kind == "MultiLineString":
        return all(len(l) >= 2 for l in payload)
    if kind == "MultiPolygon":
        return all(is_valid(("Polygon", p)) for p in payload)
    if kind == "GeometryCollection":
        return all(is_valid(g) for g in payload)
    return False


# ---------------------------------------------------------------------------
# point-in-polygon (vectorized ray casting) — the PIP kernel of the tiling graft
# ---------------------------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast of many points against one closed ring.

    Boundary behavior: points exactly on a horizontal edge may go either way (standard
    even-odd); the engine's cells are half-open so assignments stay exclusive.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    crosses = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    hit = crosses & (px < xint)
    return hit.sum(axis=1) % 2 == 1


def points_in_own_ring(px: np.ndarray, py: np.ndarray, rings: np.ndarray) -> np.ndarray:
    """``points_in_ring`` batched over a PER-POINT ring: ``rings`` is (n, m, 2)
    closed, row k tested against point k. Same expressions in the same order as
    ``points_in_ring`` (bit-identical results), one vectorized pass — replaces a
    per-unique-cell Python loop that degenerated to one kernel call per point
    when a batch's features spread across many cells (the stream's case)."""
    x0, y0 = rings[:, :-1, 0], rings[:, :-1, 1]
    x1, y1 = rings[:, 1:, 0], rings[:, 1:, 1]
    pxx = px[:, None]
    pyy = py[:, None]
    crosses = (y0 > pyy) != (y1 > pyy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (pyy - y0) * (x1 - x0) / (y1 - y0)
    hit = crosses & (pxx < xint)
    return hit.sum(axis=1) % 2 == 1


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Inside exterior ring and not inside any hole."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """Ring containment by representative-vertex test (sufficient for non-crossing rings,
    which is the multipolygon-assembly precondition — osm/package.scala:512-537)."""
    return bool(points_in_ring(inner[:1, 0], inner[:1, 1], outer)[0])


def ring_area(ring: np.ndarray) -> float:
    """Shoelace area (positive regardless of orientation)."""
    x, y = ring[:, 0], ring[:, 1]
    return abs(float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))) / 2.0


def geom_representative_point(geom) -> tuple[float, float] | None:
    """A point guaranteed meaningful for cell assignment: vertex mean for lines,
    first exterior vertex centroid fallback for polygons."""
    if geom is None:
        return None
    kind, payload = geom
    if kind == "Point":
        return float(payload[0]), float(payload[1])
    if kind == "LineString":
        if len(payload) == 0:
            return None
        c = payload.mean(axis=0)
        return float(c[0]), float(c[1])
    if kind == "Polygon":
        c = payload[0][:-1].mean(axis=0)
        return float(c[0]), float(c[1])
    if kind == "MultiLineString":
        pts = np.vstack([l for l in payload if len(l)]) if payload else None
        if pts is None or not len(pts):
            return None
        c = pts.mean(axis=0)
        return float(c[0]), float(c[1])
    if kind == "MultiPolygon":
        if not payload:
            return None
        c = payload[0][0][:-1].mean(axis=0)
        return float(c[0]), float(c[1])
    if kind == "GeometryCollection":
        for g in payload:
            p = geom_representative_point(g)
            if p is not None:
                return p
        return None
    return None


def geom_bbox(geom) -> tuple[float, float, float, float] | None:
    """(lon0, lat0, lon1, lat1) or None."""
    if geom is None:
        return None
    kind, payload = geom
    if kind == "Point":
        x, y = float(payload[0]), float(payload[1])
        return x, y, x, y
    arrs: list[np.ndarray] = []
    if kind == "LineString":
        arrs = [payload]
    elif kind in ("Polygon", "MultiLineString"):
        arrs = list(payload)
    elif kind == "MultiPolygon":
        arrs = [r for p in payload for r in p]
    elif kind == "GeometryCollection":
        boxes = [geom_bbox(g) for g in payload]
        boxes = [b for b in boxes if b is not None]
        if not boxes:
            return None
        b = np.array(boxes)
        return float(b[:, 0].min()), float(b[:, 1].min()), float(b[:, 2].max()), float(b[:, 3].max())
    arrs = [np.asarray(a, float).reshape(-1, 2) for a in arrs if np.asarray(a).size]
    if not arrs:
        return None
    pts = np.vstack(arrs)
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )
