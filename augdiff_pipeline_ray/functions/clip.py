"""Planar-arrangement polygon union — the ring-dissolve kernel for multipolygon assembly.

The reference's ``dissolveRings`` (ingest/src/main/scala/osmesa/functions/osm/
package.scala:461-468) delegates to JTS unary union over the classified rings and
splits the result into (exteriors, holes). No polygon clipper ships in this
container, so this module implements the union from scratch for simple rings:

1. split every ring edge at its intersections with edges of *other* rings
   (transversal crossings, endpoint touches and collinear overlaps),
2. de-duplicate geometrically identical sub-edges (shared boundaries),
3. classify each sub-edge by sampling the union interior a hair to each side of
   its midpoint (union membership = even-odd inside ANY ring, vectorized PIP) —
   an edge with interior on exactly one side is a boundary edge, oriented so the
   interior lies on its left,
4. stitch the directed boundary edges into cycles, taking the most-clockwise
   outgoing edge at multi-degree vertices (standard interior-on-left face walk).

CCW output cycles are union exteriors, CW cycles are holes — exactly the
``(mp.polygons.map(_.exterior), mp.polygons.flatMap(_.holes))`` split the
reference performs on the JTS result.

The identity fast path (pairwise disjoint rings — every valid OSM multipolygon)
returns the input arrays untouched, so the assembled WKB stays byte-identical to
the pre-dissolve implementation on all existing goldens.
"""

from __future__ import annotations

import numpy as np

from . import geom as G

# relative tolerances (scaled by the ring set's bbox extent)
_EPS_SIDE = 1e-7   # midpoint side-sampling offset
_EPS_SNAP = 1e-9   # vertex quantization for stitching
_EPS_PAR = 1e-12   # intersection parameter tolerance


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return (float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))) / 2.0


def _bboxes(rings: list[np.ndarray]) -> np.ndarray:
    return np.array(
        [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings]
    )


def _bbox_overlap(b1: np.ndarray, b2: np.ndarray) -> bool:
    return not (b1[2] < b2[0] or b2[2] < b1[0] or b1[3] < b2[1] or b2[3] < b1[1])


def _in_union(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Union membership: even-odd inside ANY ring (vectorized over points)."""
    inside = np.zeros(len(px), bool)
    for r in rings:
        inside |= G.points_in_ring(px, py, r)
    return inside


def _edge_list(rings: list[np.ndarray]) -> list[tuple[int, np.ndarray, np.ndarray]]:
    edges = []
    for ri, r in enumerate(rings):
        for k in range(len(r) - 1):
            p, q = r[k], r[k + 1]
            if p[0] != q[0] or p[1] != q[1]:
                edges.append((ri, p.astype(np.float64), q.astype(np.float64)))
    return edges


def _split_params(edges) -> tuple[list[list[float]], bool]:
    """For every edge, the sorted parameter values where other rings' edges cross it,
    plus whether any cross-ring collinear overlap of positive length exists (an
    interaction the cut list alone can't witness when endpoints align)."""
    cuts: list[list[float]] = [[0.0, 1.0] for _ in edges]
    collinear_touch = False
    for i in range(len(edges)):
        ri, p1, q1 = edges[i]
        d1 = q1 - p1
        for j in range(i + 1, len(edges)):
            rj, p2, q2 = edges[j]
            if ri == rj:
                continue  # simple rings don't self-intersect
            d2 = q2 - p2
            w = p2 - p1
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            if denom != 0.0:
                t = (w[0] * d2[1] - w[1] * d2[0]) / denom
                u = (w[0] * d1[1] - w[1] * d1[0]) / denom
                if -_EPS_PAR <= t <= 1 + _EPS_PAR and -_EPS_PAR <= u <= 1 + _EPS_PAR:
                    cuts[i].append(min(1.0, max(0.0, t)))
                    cuts[j].append(min(1.0, max(0.0, u)))
            else:
                # parallel: collinear overlap projects the other edge's endpoints
                if w[0] * d1[1] - w[1] * d1[0] != 0.0:
                    continue  # parallel but offset — no intersection
                len1 = d1 @ d1
                len2 = d2 @ d2
                if len1 > 0:
                    ta = ((p2 - p1) @ d1) / len1
                    tb = ((q2 - p1) @ d1) / len1
                    if min(1.0, max(ta, tb)) - max(0.0, min(ta, tb)) > _EPS_PAR:
                        collinear_touch = True
                    for t in (ta, tb):
                        if _EPS_PAR < t < 1 - _EPS_PAR:
                            cuts[i].append(t)
                if len2 > 0:
                    for pt in (p1, q1):
                        u = ((pt - p2) @ d2) / len2
                        if _EPS_PAR < u < 1 - _EPS_PAR:
                            cuts[j].append(u)
    return cuts, collinear_touch


def union_rings(
    rings: list[np.ndarray],
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Unary union of simple closed rings → (exterior rings, hole rings).

    Identity (the input arrays themselves) when rings are pairwise disjoint with
    no nesting — the valid-OSM fast path.
    """
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return [], []
    if len(rings) == 1:
        return list(rings), []

    boxes = _bboxes(rings)
    interacting = False
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            if _bbox_overlap(boxes[i], boxes[j]):
                interacting = True
                break
        if interacting:
            break
    if not interacting:
        return list(rings), []

    # bboxes touch — check for real interaction (edge crossings or nesting)
    edges = _edge_list(rings)
    cuts, collinear_touch = _split_params(edges)
    crossing = collinear_touch or any(len(set(c)) > 2 for c in cuts)
    nested = False
    if not crossing:
        for i in range(len(rings)):
            for j in range(len(rings)):
                if i != j and G.ring_contains_ring(rings[j], rings[i]):
                    nested = True
                    break
            if nested:
                break
        if not nested:
            return list(rings), []

    # -- general path: arrangement + side classification ---------------------------
    scale = float(max(boxes[:, 2].max() - boxes[:, 0].min(),
                      boxes[:, 3].max() - boxes[:, 1].min(), 1e-30))
    eps_side = _EPS_SIDE * scale
    snap = _EPS_SNAP * scale

    # sub-segments, deduplicated on quantized unordered endpoints
    segs: list[tuple[np.ndarray, np.ndarray]] = []
    seen: set[tuple] = set()
    for (ri, p, q), ts in zip(edges, cuts):
        d = q - p
        tv = sorted(set(ts))
        for a, b in zip(tv[:-1], tv[1:]):
            pa, pb = p + a * d, p + b * d
            if abs(pb[0] - pa[0]) < snap and abs(pb[1] - pa[1]) < snap:
                continue
            ka = (round(pa[0] / snap), round(pa[1] / snap))
            kb = (round(pb[0] / snap), round(pb[1] / snap))
            key = (ka, kb) if ka <= kb else (kb, ka)
            if key in seen:
                continue
            seen.add(key)
            segs.append((pa, pb))

    if not segs:
        return list(rings), []

    # classify: sample a hair to each side of every midpoint, one vectorized pass
    mids = np.array([(s[0] + s[1]) / 2.0 for s in segs])
    dirs = np.array([s[1] - s[0] for s in segs])
    norm = np.hypot(dirs[:, 0], dirs[:, 1])
    dirs = dirs / norm[:, None]
    nx, ny = -dirs[:, 1], dirs[:, 0]  # left normal
    lft = _in_union(mids[:, 0] + eps_side * nx, mids[:, 1] + eps_side * ny, rings)
    rgt = _in_union(mids[:, 0] - eps_side * nx, mids[:, 1] - eps_side * ny, rings)

    directed: list[tuple[np.ndarray, np.ndarray]] = []
    for k, (pa, pb) in enumerate(segs):
        if lft[k] and not rgt[k]:
            directed.append((pa, pb))  # interior already on the left
        elif rgt[k] and not lft[k]:
            directed.append((pb, pa))
    if not directed:
        return [], []

    # stitch into cycles: out-map on quantized vertices; at branches take the
    # most-clockwise outgoing edge from the reversed incoming direction
    def vkey(pt: np.ndarray) -> tuple:
        return (round(pt[0] / snap), round(pt[1] / snap))

    out_map: dict[tuple, list[int]] = {}
    for k, (pa, pb) in enumerate(directed):
        out_map.setdefault(vkey(pa), []).append(k)

    used = np.zeros(len(directed), bool)
    cycles: list[np.ndarray] = []
    for start in range(len(directed)):
        if used[start]:
            continue
        path = [directed[start][0]]
        cur = start
        for _ in range(len(directed) + 1):
            used[cur] = True
            pa, pb = directed[cur]
            path.append(pb)
            if vkey(pb) == vkey(path[0]):
                break
            cands = [k for k in out_map.get(vkey(pb), []) if not used[k]]
            if not cands:
                break  # open chain (numerical residue) — dropped below
            if len(cands) == 1:
                cur = cands[0]
            else:
                d_in = pb - pa
                rev = np.arctan2(-d_in[1], -d_in[0])
                best, best_ang = cands[0], None
                for k in cands:
                    dk = directed[k][1] - directed[k][0]
                    ang = (np.arctan2(dk[1], dk[0]) - rev) % (2 * np.pi)
                    if best_ang is None or ang < best_ang:
                        best, best_ang = k, ang
                cur = best
        else:
            continue
        if len(path) >= 4 and vkey(path[-1]) == vkey(path[0]):
            ring = np.array(path)
            ring[-1] = ring[0]  # exact closure
            cycles.append(ring)

    exteriors = [c for c in cycles if _ring_signed_area(c) > 0]
    holes = [c for c in cycles if _ring_signed_area(c) < 0]
    return exteriors, holes
