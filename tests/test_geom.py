"""Unit tests: WKB codec round-trip, WKT, PIP, isArea truth table, assembly kernels."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from augdiff_pipeline_ray.functions import assembly as A
from augdiff_pipeline_ray.functions import geom as G
from augdiff_pipeline_ray.functions import clip as CLIP
from augdiff_pipeline_ray.functions import osm as OSM


def ring(coords):
    return np.array(coords, dtype=np.float64)


SQUARE = ring([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
HOLE = ring([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]])
FAR = ring([[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]])


def test_wkb_roundtrip_all_kinds():
    geoms = [
        ("Point", np.array([1.5, -2.5])),
        ("LineString", ring([[0, 0], [1, 1], [2, 0]])),
        ("Polygon", [SQUARE, HOLE]),
        ("MultiLineString", [ring([[0, 0], [1, 1]]), ring([[2, 2], [3, 3]])]),
        ("MultiPolygon", [[SQUARE, HOLE], [FAR]]),
    ]
    for g in geoms:
        wkb = G.geom_to_wkb(g)
        back = G.wkb_to_geom(wkb)
        assert back[0] == g[0]
    gc = ("GeometryCollection", geoms[:2])
    back = G.wkb_to_geom(G.geom_to_wkb(gc))
    assert back[0] == "GeometryCollection" and len(back[1]) == 2


def test_wkb_shapely_compat_via_duckdb():
    # cross-check our WKB bytes against an independent reader (duckdb spatial may be
    # absent; fall back to checking the known little-endian point layout)
    wkb = G.point_wkb(1.0, 2.0)
    assert wkb[:5] == b"\x01\x01\x00\x00\x00"
    import struct

    x, y = struct.unpack_from("<dd", wkb, 5)
    assert (x, y) == (1.0, 2.0)


def test_wkt():
    assert G.geom_to_wkt(("Point", np.array([1.0, 2.0]))) == "POINT (1 2)"
    assert G.geom_to_wkt(("LineString", ring([[0, 0], [1, 1]]))) == "LINESTRING (0 0, 1 1)"


def test_pip_square_and_hole():
    px = np.array([2.0, 1.5, 8.0, 0.5])
    py = np.array([3.0, 1.5, 8.0, 0.5])
    inside = G.points_in_polygon(px, py, [SQUARE, HOLE])
    assert inside.tolist() == [True, False, False, True]


def test_ring_containment_and_area():
    assert G.ring_contains_ring(SQUARE, HOLE)
    assert not G.ring_contains_ring(HOLE, SQUARE)
    assert not G.ring_contains_ring(SQUARE, FAR)
    assert G.ring_area(SQUARE) == 16.0


# -- isArea truth table (inverted id-area-keys semantics) -----------------------------


@pytest.mark.parametrize(
    "tags,expected",
    [
        ({"area": "yes"}, True),
        ({"area": "no", "building": "house"}, False),  # explicit boolean wins
        ({"area": "maybe", "building": "house"}, True),  # non-boolean area ignored
        ({"building": "house"}, True),  # key with empty exception set
        ({"waterway": "river"}, False),  # value in the inverted set ⇒ NOT area
        ({"waterway": "riverbank"}, True),  # value not listed ⇒ area
        ({"highway": "primary"}, False),  # key not in table
        ({}, False),
        ({"leisure": "track"}, False),
        ({"leisure": "park"}, True),
    ],
)
def test_is_area(tags, expected):
    assert OSM.is_area(tags) is expected


def test_is_multipolygon_and_route():
    assert OSM.is_multipolygon({"type": "multipolygon"})
    assert OSM.is_multipolygon({"type": "Boundary"})
    assert not OSM.is_multipolygon({"type": "route"})
    assert OSM.is_route({"type": "route"})
    assert not OSM.is_route({})


# -- segment chaining / ring forming / multipolygon assembly --------------------------


def test_connect_segments_chains_with_reversal():
    s1 = ring([[0, 0], [1, 0]])
    s2 = ring([[2, 0], [1, 0]])  # must be reversed to attach
    s3 = ring([[2, 0], [3, 0]])
    out = A.connect_segments([s1, s2, s3])
    assert len(out) == 1
    assert out[0].tolist() == [[0, 0], [1, 0], [2, 0], [3, 0]]


def test_connect_segments_emits_disconnected():
    s1 = ring([[0, 0], [1, 0]])
    s2 = ring([[5, 5], [6, 6]])
    out = A.connect_segments([s1, s2])
    assert len(out) == 2


def test_form_rings_success_and_failure():
    half1 = ring([[0, 0], [2, 0], [2, 2]])
    half2 = ring([[2, 2], [0, 2], [0, 0]])
    rings = A.form_rings([half1, half2])
    assert len(rings) == 1
    assert rings[0][0].tolist() == rings[0][-1].tolist()
    with pytest.raises(A.AssemblyError):
        A.form_rings([ring([[0, 0], [1, 0]])])


def test_build_multipolygon_with_hole():
    wkbs = [G.linestring_wkb(SQUARE), G.linestring_wkb(HOLE)]
    out = A.build_multipolygon([2, 2], ["outer", "inner"], wkbs)
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 2


def test_build_multipolygon_two_outers():
    wkbs = [G.linestring_wkb(SQUARE), G.linestring_wkb(FAR)]
    out = A.build_multipolygon([2, 2], ["outer", "outer"], wkbs)
    g = G.wkb_to_geom(out)
    assert g[0] == "MultiPolygon" and len(g[1]) == 2


def test_build_multipolygon_parity_reclassification():
    # roles lie: hole tagged "outer" — parity classification fixes it
    wkbs = [G.linestring_wkb(SQUARE), G.linestring_wkb(HOLE)]
    out = A.build_multipolygon([2, 2], ["outer", "outer"], wkbs)
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 2


def test_build_multipolygon_from_partial_segments():
    half1 = ring([[0, 0], [4, 0], [4, 4]])
    half2 = ring([[4, 4], [0, 4], [0, 0]])
    wkbs = [G.linestring_wkb(half1), G.linestring_wkb(half2)]
    out = A.build_multipolygon([2, 2], ["outer", "outer"], wkbs)
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon"


def test_build_multipolygon_overlapping_outers_dissolve():
    # two overlapping outer rings → ONE dissolved Polygon (reference dissolveRings,
    # osm/package.scala:461-468), not a GeometryCollection fallback
    a = ring([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    b = ring([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]])
    out = A.build_multipolygon([2, 2], ["outer", "outer"], [G.linestring_wkb(a), G.linestring_wkb(b)])
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 1
    # union area = 16 + 16 - 4
    assert abs(G.ring_area(g[1][0]) - 28.0) < 1e-9


def test_build_multipolygon_touching_outers_dissolve():
    # edge-adjacent outer rings merge into one rectangle (union along the shared edge)
    a = ring([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])
    b = ring([[2, 0], [4, 0], [4, 2], [2, 2], [2, 0]])
    out = A.build_multipolygon([2, 2], ["outer", "outer"], [G.linestring_wkb(a), G.linestring_wkb(b)])
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 1
    assert abs(G.ring_area(g[1][0]) - 8.0) < 1e-9


def test_build_multipolygon_dissolve_hole_from_outer_union():
    # four overlapping rectangles forming a frame: the union's hole becomes an
    # inner ring of the dissolved polygon (addlInners in the reference)
    frame = [
        ring([[0, 0], [3, 0], [3, 1], [0, 1], [0, 0]]),
        ring([[2, 0], [3, 0], [3, 3], [2, 3], [2, 0]]),
        ring([[0, 2], [3, 2], [3, 3], [0, 3], [0, 2]]),
        ring([[0, 0], [1, 0], [1, 3], [0, 3], [0, 0]]),
    ]
    out = A.build_multipolygon(
        [2] * 4, ["outer"] * 4, [G.linestring_wkb(r) for r in frame]
    )
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 2  # exterior + dissolved hole
    assert abs(G.ring_area(g[1][0]) - 9.0) < 1e-9
    assert abs(G.ring_area(g[1][1]) - 1.0) < 1e-9


def test_build_multipolygon_overlapping_inners_dissolve():
    # overlapping inner rings dissolve into one hole before attachment
    outer = ring([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]])
    i1 = ring([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]])
    i2 = ring([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]])
    out = A.build_multipolygon(
        [2, 2, 2], ["outer", "inner", "inner"],
        [G.linestring_wkb(outer), G.linestring_wkb(i1), G.linestring_wkb(i2)],
    )
    g = G.wkb_to_geom(out)
    assert g[0] == "Polygon" and len(g[1]) == 2
    assert abs(G.ring_area(g[1][1]) - 7.0) < 1e-9  # 4 + 4 - 1


def test_union_rings_identity_is_same_objects():
    # the valid-OSM fast path must return the input arrays untouched (byte-golden
    # stability of the assembled WKB)
    a = ring([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
    b = ring([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]])
    ex, holes = CLIP.union_rings([a, b])
    assert holes == [] and ex[0] is a and ex[1] is b


def test_union_rings_nested_swallows_inner():
    a = ring([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    b = ring([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]])
    ex, holes = CLIP.union_rings([a, b])
    assert len(ex) == 1 and holes == []
    assert abs(G.ring_area(ex[0]) - 16.0) < 1e-9


def test_union_rings_corner_touch_stays_multi():
    a = ring([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
    b = ring([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]])
    ex, holes = CLIP.union_rings([a, b])
    assert len(ex) == 2 and holes == []


def test_build_multipolygon_incomplete_way_member():
    assert A.build_multipolygon([2, 2], ["outer", "outer"], [G.linestring_wkb(SQUARE), None]) is None


def test_build_multipolygon_unclosable():
    assert (
        A.build_multipolygon([2], ["outer"], [G.linestring_wkb(ring([[0, 0], [1, 0]]))])
        is None
    )


def test_build_route():
    s1 = ring([[0, 0], [1, 0]])
    s2 = ring([[1, 0], [2, 0]])
    s3 = ring([[9, 9], [8, 8]])
    out = A.build_route(
        [2, 2, 2],
        ["forward", "forward", "backward"],
        [G.linestring_wkb(s1), G.linestring_wkb(s2), G.linestring_wkb(s3)],
    )
    d = dict(out)
    assert G.wkb_to_geom(d["forward"])[0] == "LineString"
    assert G.wkb_to_geom(d["backward"])[0] == "LineString"
    assert A.build_route([2], ["forward"], [None]) is None


def test_multiline_fold():
    ml = A.get_multiline(
        [("LineString", ring([[0, 0], [1, 1]])), ("MultiLineString", [ring([[2, 2], [3, 3]])])]
    )
    assert ml[0] == "MultiLineString" and len(ml[1]) == 2
    assert A.get_multiline([]) is None


# ---------------------------------------------------------------------------
# property-based: segment chaining is invariant to order/reversal (hypothesis)
# ---------------------------------------------------------------------------


def _edge_multiset(chains):
    """Undirected edge multiset of a list of polylines (chaining invariant)."""
    edges = []
    for c in chains:
        for p, q in zip(map(tuple, np.round(c[:-1], 12)), map(tuple, np.round(c[1:], 12))):
            edges.append((p, q) if p <= q else (q, p))
    return sorted(edges)


@given(
    n_chains=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=60, deadline=None)
def test_connect_segments_preserves_edges_and_reassembles_in_order(n_chains, seed):
    """The greedy chainer extends only at the TAIL (reference semantics,
    osm/package.scala:434-459), so a shuffled open polyline may legitimately come
    back in more than one piece. The guaranteed properties: (a) the undirected edge
    multiset is preserved under ANY shuffle/reversal, with no more pieces than
    segments; (b) segments fed in chain order, forward-oriented, reassemble each
    polyline exactly."""
    rng = np.random.default_rng(seed)
    chains = []
    x0 = 0.0
    for c in range(n_chains):
        npts = int(rng.integers(3, 9))
        # strictly increasing x keeps endpoints globally unique across chains
        xs = x0 + np.cumsum(rng.uniform(0.1, 1.0, npts))
        x0 = xs[-1] + 5.0
        ys = rng.uniform(-1, 1, npts)
        chains.append(np.column_stack([xs, ys]))
    segments = []
    for ch in chains:
        cuts = sorted(set([0, len(ch) - 1]) | set(
            int(i) for i in rng.integers(1, len(ch) - 1, size=int(rng.integers(0, 3)))
        ))
        for a, b in zip(cuts[:-1], cuts[1:]):
            segments.append(ch[a:b + 1])

    # (b) chain order, forward orientation → exact reassembly
    out = A.connect_segments([s.copy() for s in segments])
    assert len(out) == len(chains)
    assert sorted(c.tobytes() for c in out) == sorted(c.tobytes() for c in chains)

    # (a) any shuffle + reversal → edges preserved, piece count bounded
    shuf = [segments[i][::-1].copy() if rng.random() < 0.5 else segments[i].copy()
            for i in rng.permutation(len(segments))]
    out2 = A.connect_segments(shuf)
    assert len(chains) <= len(out2) <= len(segments)
    assert _edge_multiset(out2) == _edge_multiset(chains)


@given(seed=st.integers(0, 10_000), ncut=st.integers(0, 4))
@settings(max_examples=60, deadline=None)
def test_form_rings_from_shuffled_cuts(seed, ncut):
    """A closed ring cut at random points and shuffled/reversed always re-forms to
    the same ring (up to rotation + orientation)."""
    rng = np.random.default_rng(seed)
    npts = int(rng.integers(4, 10))
    ang = np.sort(rng.uniform(0, 2 * np.pi, npts))
    ring = np.column_stack([np.cos(ang), np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])  # closed
    cuts = sorted(set([0]) | set(int(i) for i in rng.integers(1, npts, size=ncut)))
    segs = []
    cuts2 = cuts + [npts]
    for a, b in zip(cuts2[:-1], cuts2[1:]):
        seg = ring[a:b + 1]
        segs.append(seg[::-1].copy() if rng.random() < 0.5 else seg)
    rng.shuffle(segs)
    out = A.form_rings(segs)
    assert len(out) == 1
    got = out[0]
    assert _closed_set(got) == _closed_set(ring)


def _closed_set(r):
    """Vertex multiset of a closed ring (rotation/orientation invariant compare)."""
    return sorted(map(tuple, np.round(r[:-1], 12)))


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12), st.integers(1, 6), st.integers(1, 6)),
    min_size=2, max_size=5,
))
def test_union_rings_sampled_membership(rects):
    """Property: union output (exteriors minus holes, even-odd) classifies random
    probe points exactly like 'inside ANY input ring' — the defining property of
    a union — for arbitrary overlapping/touching/nested axis-aligned rectangles."""
    rings = [
        ring([[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]])
        for x, y, w, h in rects
    ]
    ex, holes = CLIP.union_rings(list(rings))
    rng = np.random.RandomState(7)
    px = rng.uniform(-1, 20, 400)
    py = rng.uniform(-1, 20, 400)
    want = np.zeros(400, bool)
    for r in rings:
        want |= G.points_in_ring(px, py, r)
    got = np.zeros(400, bool)
    for e in ex:
        got |= G.points_in_ring(px, py, e)
    for h in holes:
        got &= ~G.points_in_ring(px, py, h)
    # irrational-ish probes never sit on integer-coordinate edges, so the
    # even-odd classification is unambiguous on both sides
    assert np.array_equal(got, want)
