"""OSM geometry assembly: segment chaining, ring formation, multipolygon + route building.

Pure-Python/numpy re-expression of the reference's assembly kernels
(ingest/src/main/scala/osmesa/functions/osm/package.scala):

* ``connect_segments`` (:434-459): greedily chain open segments end-to-start (reversing
  when only the far end matches) into maximal polylines; unconnectable heads are emitted
  as finished lines.
* ``form_rings`` (:400-431): same chaining but every chain must close — otherwise
  ``AssemblyError`` ("Unable to connect segments").
* ``build_multipolygon`` (:471-553): the full pipeline — bail to None if any way member
  lacks geometry; split members (roles outer/inner/"") into closed rings vs partial
  segments; chain partials (sorted by vertex count desc); reclassify ALL rings by
  containment parity over area-desc order (largest ring is an outer); attach each inner to
  the largest containing outer, consuming it once; emit Polygon or MultiPolygon.
* ``build_route`` (:561-599): group line members by role, chain per role, emit
  (role, Line|MultiLine) pairs.

numpy (N,2) arrays + slice/[::-1] views replace the reference's Reversed/Partial/Virtual
CoordinateSequence rope (:210-398) — same zero-copy chaining, none of the machinery.

Ring dissolve (:461-468): overlapping/touching same-class rings are unioned through the
from-scratch planar-arrangement clipper in ``functions/clip.py`` (the reference delegates
to JTS unary union) — union exteriors become dissolved outers, union holes resurface as
inners and vice versa, matching ``dissolveRings``'s (exterior, holes) split. Disjoint
rings (every valid OSM multipolygon) take a byte-identical identity fast path.
"""

from __future__ import annotations

import numpy as np

from . import clip as CLIP
from . import geom as G
from .osm import MEMBER_WAY_CODE


class AssemblyError(Exception):
    """Mirror of the reference's AssemblyException."""


def _closed(seg: np.ndarray) -> bool:
    return len(seg) >= 2 and seg[0, 0] == seg[-1, 0] and seg[0, 1] == seg[-1, 1]


def _chain(segments: list[np.ndarray], require_rings: bool) -> list[np.ndarray]:
    """Shared greedy chainer. require_rings=True → AssemblyError when a chain can't close."""
    pending = list(segments)
    done: list[np.ndarray] = []
    while pending:
        head = pending.pop(0)
        if require_rings and _closed(head):
            done.append(head)
            continue
        while True:
            if require_rings and _closed(head):
                done.append(head)
                break
            hx, hy = head[-1, 0], head[-1, 1]
            nxt_i = None
            reverse = False
            for i, seg in enumerate(pending):
                if seg[0, 0] == hx and seg[0, 1] == hy:
                    nxt_i = i
                    break
            if nxt_i is None:
                for i, seg in enumerate(pending):
                    if seg[-1, 0] == hx and seg[-1, 1] == hy:
                        nxt_i = i
                        reverse = True
                        break
            if nxt_i is None:
                if require_rings:
                    raise AssemblyError("Unable to connect segments.")
                done.append(head)
                break
            nxt = pending.pop(nxt_i)
            if reverse:
                nxt = nxt[::-1]
            head = np.vstack([head, nxt[1:]])
    return done


def connect_segments(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Chain open segments into maximal polylines (no closure requirement)."""
    return _chain(segments, require_rings=False)


def form_rings(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Chain partial segments into closed rings; raise AssemblyError when impossible."""
    rings = _chain(segments, require_rings=True)
    for r in rings:
        if not _closed(r):
            raise AssemblyError("Unable to connect segments.")
    return rings


def build_multipolygon(
    types: list[int],
    roles: list[str],
    wkbs: list[bytes | None],
) -> bytes | None:
    """(member types [1/2/3], roles, member WKBs) → Polygon/MultiPolygon WKB or None.

    None ⇒ caller falls back to GeometryCollection (RowsToJson.scala:333-336).
    """
    if any(t == MEMBER_WAY_CODE and w is None for t, w in zip(types, wkbs)):
        return None  # incomplete relation: a way member with no geometry

    # decode: polygons contribute their exterior as a (closed) line; lines pass through
    lines: list[tuple[str, np.ndarray]] = []
    for role, wkb in zip(roles, wkbs):
        if wkb is None:
            continue
        g = G.wkb_to_geom(wkb)
        if g is None:
            continue
        kind, payload = g
        if kind == "Polygon":
            lines.append((role, payload[0]))
        elif kind == "LineString":
            lines.append((role, payload))
        # other geometry kinds are not line-able → dropped (reference `as[Line]` → None)

    complete: list[np.ndarray] = []
    partial: list[np.ndarray] = []
    for role, line in lines:
        if role in ("outer", "inner", ""):
            if _closed(line) and len(line) >= 4:
                complete.append(line)
            else:
                partial.append(line)
        # any other role: dropped

    try:
        partial.sort(key=len, reverse=True)
        rings = complete + form_rings(partial)
        if not rings:
            return None

        # classify by containment parity, visiting rings by area desc; largest = outer.
        # Containment here must be FULL containment (JTS prepared.contains, :512-517):
        # a partially-overlapping ring is NOT contained — it stays an outer and the
        # dissolve below unions it. The cheap first-vertex test would misclassify it.
        def _contains_full(outer_ring: np.ndarray, inner_ring: np.ndarray) -> bool:
            return bool(
                G.points_in_ring(
                    inner_ring[:-1, 0], inner_ring[:-1, 1], outer_ring
                ).all()
            )

        order = sorted(range(len(rings)), key=lambda i: -G.ring_area(rings[i]))
        outers: list[np.ndarray] = [rings[order[0]]]
        inners: list[np.ndarray] = []
        for idx in order[1:]:
            ring = rings[idx]
            containing = sum(
                1
                for j in range(len(rings))
                if j != idx and _contains_full(rings[j], ring)
            )
            (outers if containing % 2 == 0 else inners).append(ring)

        # dissolve (package.scala:461-468,529-531): union the outer rings — the
        # union's exteriors are the dissolved outers, its holes become additional
        # inners; then union the inner rings (+ those holes) — exteriors are the
        # dissolved inners, holes resurface as additional outers. Identity (the
        # same ndarray objects) for pairwise-disjoint rings, the valid-OSM path.
        outers_d, addl_inners = CLIP.union_rings(outers)
        if inners or addl_inners:
            inners_d, addl_outers = CLIP.union_rings(inners + addl_inners)
        else:
            inners_d, addl_outers = [], []
        if not outers_d and not addl_outers:
            return None

        # attach inners to largest containing outer, each inner used once
        all_outers = sorted(outers_d + addl_outers, key=G.ring_area, reverse=True)
        polys: list[list[np.ndarray]] = []
        remaining = list(inners_d)
        for outer in all_outers:
            mine = [r for r in remaining if G.ring_contains_ring(outer, r)]
            remaining = [r for r in remaining if not G.ring_contains_ring(outer, r)]
            polys.append([outer] + mine)

        if len(polys) == 1:
            return G.polygon_wkb(polys[0])
        return G.multipolygon_wkb(polys)
    except AssemblyError:
        return None


def build_route(
    types: list[int],
    roles: list[str],
    wkbs: list[bytes | None],
) -> list[tuple[str, bytes]] | None:
    """Route assembly: per-role segment chaining → [(role, Line|MultiLine WKB)], or None
    when a way member has no geometry."""
    if any(t == MEMBER_WAY_CODE and w is None for t, w in zip(types, wkbs)):
        return None
    by_role: dict[str, list[np.ndarray]] = {}
    for role, wkb in zip(roles, wkbs):
        if wkb is None:
            continue
        g = G.wkb_to_geom(wkb)
        if g is None or g[0] != "LineString":
            continue  # polygons are not part of routes
        by_role.setdefault(role, []).append(g[1])
    try:
        out = []
        for role, segs in by_role.items():
            chained = connect_segments(segs)
            if len(chained) == 1:
                out.append((role, G.linestring_wkb(chained[0])))
            else:
                out.append((role, G.multilinestring_wkb(chained)))
        return out
    except AssemblyError:
        return None


def get_multiline(geoms: list) -> tuple | None:
    """Fold member Line/MultiLine geometries into one MultiLine
    (ad/src/main/scala/RowsToJson.scala:86-100); None when empty."""
    lines: list[np.ndarray] = []
    for g in geoms:
        if g is None:
            continue
        kind, payload = g
        if kind == "LineString":
            lines.append(payload)
        elif kind == "MultiLineString":
            lines.extend(payload)
        else:
            raise ValueError("non-line geometry in multiline relation")
    if not lines:
        return None
    return ("MultiLineString", lines)
