"""Pixel-exact invariants for the raster pyramid + zonal statistics operators
(stages/raster.py). The DuckDB oracle pins raster_pyramid's grouping bookkeeping;
these pin the pixel math (bit-exact integer box filter, exact int64 zonal sums)
against local re-derivations through the same engine codec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from augdiff_pipeline_ray.functions import image as IMG
from augdiff_pipeline_ray.stages import raster as RAS

SF = "/root/testdata/sf0.001"


def _df(x):
    import ray

    if isinstance(x, ray.data.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    return x


def test_box_down2_exact():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = RAS.box_down2(px)
    assert out.shape == (4, 4, 3)
    for y in range(4):
        for x in range(4):
            blk = px[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].astype(int)
            assert (out[y, x] == blk.reshape(4, 3).sum(0) // 4).all()


def test_build_parent_quadrants_and_missing_children():
    # two children present (NW, SE), two quadrants missing -> zeros
    a = IMG.synth_pixels("t#a", 32, 32)
    b = IMG.synth_pixels("t#b", 48, 24)  # non-normalized size exercises the resize
    blob_a = IMG.encode(a, "rawz")
    blob_b = IMG.encode(b, "qz")
    px, n = RAS.build_parent([(0, 0, blob_a), (1, 1, blob_b)])
    assert n == 2 and px.shape == (32, 32, 3)
    mosaic = np.zeros((64, 64, 3), np.uint8)
    mosaic[:32, :32] = a
    bq, _ = IMG.decode(blob_b)  # qz is lossy: compare against the decoded child
    mosaic[32:, 32:] = IMG.resize_bilinear(bq, 32, 32)
    assert (px == RAS.box_down2(mosaic)).all()
    # empty quadrants really are zero after downsampling
    assert px[:16, 16:].sum() == 0 and px[16:, :16].sum() == 0


def test_child_grid_parents_group_2x2():
    d = np.arange(512, dtype=np.int64)
    g = RAS.child_grid(d)
    # 256 tiles/page -> 64 parents/page, each with exactly 4 children
    df = pd.DataFrame(g)
    sizes = df.groupby("parent").size()
    assert (sizes == 4).all() and len(sizes) == 128
    # children of one parent span exactly a 2x2 block
    for parent, grp in df.groupby("parent"):
        assert grp["tx"].max() - grp["tx"].min() == 1
        assert grp["ty"].max() - grp["ty"].min() == 1


def test_pyramid_query_counts_and_blob(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_raster_pyramid

    out = _df(q_raster_pyramid(SF)).sort_values(["page", "pty", "ptx"])
    assert int(out["n_children"].sum()) == 500  # every tile lands in one parent
    assert (out["n_children"] <= 4).all() and (out["n_children"] >= 1).all()


def test_zonal_stats_matches_local_decode(ray_session):
    from augdiff_pipeline_ray import georef
    from augdiff_pipeline_ray.pipelines import tpch as TP
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_zonal_stats

    out = _df(q_zonal_stats(SF)).set_index("cell").sort_index()
    t = TP.images_from_documents(SF)
    cells = np.asarray(georef.cell_of_image(t["phash"]), np.int64)
    exp: dict[int, np.ndarray] = {}
    for c, blob in zip(cells, t["bytes"]):
        px, _ = IMG.decode(blob.as_py())
        row = np.array(
            [1, px.shape[0] * px.shape[1], *px.reshape(-1, 3).sum(0, dtype=np.int64)],
            np.int64,
        )
        exp[int(c)] = exp.get(int(c), np.zeros(5, np.int64)) + row
    assert set(out.index) == set(exp)
    for c, row in exp.items():
        got = out.loc[c, ["n_tiles", "n_px", "sum_r", "sum_g", "sum_b"]].to_numpy(
            np.int64
        )
        assert (got == row).all()


def test_geoms_tile_stats_equals_per_geometry_masks():
    """The r5 vectorized overlay rasterizer must reproduce the per-geometry
    mask loop EXACTLY — changed_px (per-geometry pixel counts summed, overlap
    within one geometry counted once) and the union mask — across random mixes
    of points/lines/polys/multis/collections, NaN rows, and off-tile geometry."""
    import numpy as np

    from augdiff_pipeline_ray.stages import tiles as T

    rng = np.random.default_rng(7)
    h, w = 256, 128
    bbox = (10.0, 10.01, 20.0, 20.005)

    def rand_coords(n, spread=1.5):
        return np.column_stack([
            20.0 + rng.uniform(-0.005 * spread, 0.01 * spread, n),
            10.0 + rng.uniform(-0.01 * spread, 0.02 * spread, n)])

    def rand_geom():
        k = rng.integers(0, 6)
        if k == 0:
            return ("Point", rand_coords(1)[0])
        if k == 1:
            c = rand_coords(rng.integers(2, 8))
            if rng.random() < 0.2:
                c[rng.integers(0, len(c))] = np.nan
            return ("LineString", c)
        if k == 2:
            return ("MultiLineString",
                    [rand_coords(rng.integers(2, 5)) for _ in range(rng.integers(1, 4))])
        if k == 3:
            c = rand_coords(rng.integers(3, 7))
            return ("Polygon", [np.vstack([c, c[:1]])])
        if k == 4:
            polys = []
            for _ in range(rng.integers(1, 3)):
                c = rand_coords(rng.integers(3, 6))
                polys.append([np.vstack([c, c[:1]])])
            return ("MultiPolygon", polys)
        return ("GeometryCollection", [rand_geom() for _ in range(rng.integers(1, 3))])

    for trial in range(40):
        glist = [(i, rand_geom()) for i in range(rng.integers(1, 30))]
        changed = 0
        union = None
        for gi, g in glist:
            m = T.geom_tile_mask(h, w, bbox, g)
            c = int(m.sum())
            if c:
                changed += c
                union = m if union is None else (union | m)
        uref = union if union is not None else np.zeros((h, w), bool)
        c2, u2 = T.geoms_tile_stats(h, w, bbox, glist)
        assert c2 == changed, trial
        assert np.array_equal(u2, uref), trial
