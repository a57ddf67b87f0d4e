"""Unit tests: WKB codec round-trip, WKT, PIP, isArea truth table, assembly kernels."""

import numpy as np
import pytest

from augdiff_pipeline_ray.functions import assembly as A
from augdiff_pipeline_ray.functions import geom as G
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
