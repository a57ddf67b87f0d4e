"""Unit tests: key packing round-trip (M1), partition fn exact values (M2), cell index."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from augdiff_pipeline_ray import cells as C
from augdiff_pipeline_ray import georef
from augdiff_pipeline_ray import keys as K


def ref_partition(id_: int, tipe: str) -> int:
    """Direct transcription of Common.scala:59-72 for cross-checking."""
    a = id_
    while a > (1 << 11):
        a //= 10
    return a ^ {"node": 0, "way": 1, "relation": 2}[tipe]


def test_pack_roundtrip():
    ids = np.array([0, 1, 5, 123456789012, 2**60], dtype=np.int64)
    types = np.array(["node", "way", "relation", "node", "way"])
    keys = K.pack_typed(ids, types)
    assert (K.unpack_id(keys) == ids).all()
    assert (K.unpack_code(keys) == K.type_code(types)).all()


@given(st.integers(min_value=0, max_value=2**59), st.sampled_from(["node", "way", "relation"]))
def test_pack_roundtrip_property(id_, tipe):
    key = int(K.pack_typed(np.array([id_]), np.array([tipe]))[0])
    assert key >> 2 == id_
    assert key & 3 == K.TYPE_CODES[tipe]


@given(st.integers(min_value=0, max_value=2**62), st.sampled_from(["node", "way", "relation"]))
def test_partition_number_matches_reference(id_, tipe):
    got = int(K.partition_number_typed(np.array([id_]), np.array([tipe]))[0])
    assert got == ref_partition(id_, tipe)


def test_partition_number_exact_values():
    # hand-computed: 2048 stays (strict >), 2049 → 204, 123456 → 1234... → 123
    assert int(K.partition_number(np.array([2048]), np.array([0]))[0]) == 2048
    assert int(K.partition_number(np.array([2049]), np.array([0]))[0]) == 204
    assert int(K.partition_number(np.array([123456]), np.array([0]))[0]) == 1234 ^ 0
    assert int(K.partition_number(np.array([7]), np.array([2]))[0]) == 7 ^ 2


def test_cell_roundtrip_and_bounds():
    lat = np.array([0.0, 45.5, -89.9, 89.9, 0.0])
    lon = np.array([0.0, -122.3, 179.9, -179.9, 13.37])
    cells = C.cell_of(lat, lon, 8)
    assert (C.cell_res(cells) == 8).all()
    lat0, lat1, lon0, lon1 = C.cell_bounds(cells)
    assert ((lat >= lat0) & (lat < lat1)).all()
    assert ((lon >= lon0) & (lon < lon1)).all()


def test_cell_parent_contains_child():
    cell = int(C.cell_of(np.array([47.6]), np.array([-122.3]), 8)[0])
    par = int(C.parent(np.array([cell]))[0])
    assert int(C.cell_res(np.array([par]))[0]) == 7
    kids = C.children(par)
    assert cell in set(kids.tolist())


def test_k_ring_size_and_wrap():
    cell = int(C.cell_of(np.array([0.0]), np.array([179.9]), 8)[0])
    ring = C.k_ring(cell, 1)
    assert len(ring) == 9  # full 3×3 away from poles, wraps the antimeridian
    assert cell in set(ring.tolist())


def test_nan_cell_is_sentinel():
    assert int(C.cell_of(np.array([np.nan]), np.array([1.0]))[0]) == -1


def test_georef_deterministic_and_in_bounds():
    ph = np.array([0, 1, 2**31 - 1, 123456789], dtype=np.int64)
    lat, lon = georef.centroid(ph)
    assert ((lat >= -90) & (lat < 90)).all()
    assert ((lon >= -180) & (lon < 180)).all()
    lat2, lon2 = georef.centroid(ph)
    assert (lat == lat2).all() and (lon == lon2).all()
    lat0, lat1, lon0, lon1 = georef.footprint(ph, np.full(4, 256), np.full(4, 128))
    assert ((lat1 - lat0) > 0).all() and ((lon1 - lon0) > 0).all()
    cells = georef.cell_of_image(ph)
    assert (C.cell_res(cells) == C.DEFAULT_RES).all()
