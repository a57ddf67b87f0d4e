"""Scalar UDF analogues: larger, getInstant, asDouble/asFloat, ST_* kernels (M3-M8)."""

import math

import numpy as np
import pyarrow as pa

from augdiff_pipeline_ray.functions import geom as G
from augdiff_pipeline_ray.functions import scalar as SC


def test_larger():
    x = pa.array([1, 5, 3], pa.int64())
    y = pa.array([2, 4, 3], pa.int64())
    assert SC.larger(x, y).to_pylist() == [2, 5, 3]


def test_get_instant():
    ts = pa.array([0, 1_704_067_200_000], pa.timestamp("ms"))
    assert SC.get_instant(ts).to_pylist() == [0, 1_704_067_200_000]


def test_as_double_null_to_nan():
    out = SC.as_double(pa.array([1, None], pa.int64())).to_pylist()
    assert out[0] == 1.0 and math.isnan(out[1])
    out32 = SC.as_float(pa.array([2.5, None], pa.float64())).to_pylist()
    assert out32[0] == 2.5 and math.isnan(out32[1])


def test_st_point_and_friends():
    wkbs = SC.st_point([1.0, float("nan")], [2.0, 3.0])
    assert wkbs[1] is None
    assert G.wkb_to_geom(wkbs[0])[1].tolist() == [1.0, 2.0]
    assert SC.st_as_text(wkbs) == ["POINT (1 2)", None]
    assert SC.st_is_empty(wkbs) == [False, True]
    assert SC.st_is_valid(wkbs) == [True, False]


def test_web_mercator():
    x, y = SC.lonlat_to_web_mercator([0.0, 180.0], [0.0, 0.0])
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    assert abs(x[1] - 20037508.34) < 1.0
    merc = SC.st_transform_point_wkb(SC.st_point([10.0], [45.0]))
    g = G.wkb_to_geom(merc[0])
    assert abs(g[1][0] - 1113194.9) < 1.0
    assert abs(g[1][1] - 5621521.5) < 1.0
