"""Salted skew-splitting shuffle: hot-key detection, salted count/apply == unsalted."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from augdiff_pipeline_ray import georef
from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.stages import shuffle as SH


@pytest.fixture(scope="module")
def skewed_cells(ray_session):
    # the worldgen image table is deliberately skewed: ~30% of tiles in 2 hot cells
    t = W.images_table(W.WorldConfig(n_images=512))
    cells = georef.cell_of_image(t["phash"])
    return pa.table({"cell": pa.array(cells), "phash": t["phash"]})


def test_detect_hot_keys(skewed_cells):
    ds = rd.from_arrow(skewed_cells)
    hot = SH.detect_hot_keys(ds, "cell", hot_threshold=50)
    cells = skewed_cells["cell"].to_numpy(zero_copy_only=False)
    _, counts = np.unique(cells, return_counts=True)
    want = {int(c) for c, n in zip(np.unique(cells), counts) if n >= 50}
    assert hot == want
    # the 2 hot clusters may straddle cell boundaries → up to 4 hot cells
    assert 2 <= len(hot) <= 4


def test_salted_count_equals_unsalted(skewed_cells):
    ds = rd.from_arrow(skewed_cells)
    out = SH.salted_group_count(ds, "cell", hot_threshold=50, k=4).to_pandas()
    cells = skewed_cells["cell"].to_numpy(zero_copy_only=False)
    u, c = np.unique(cells, return_counts=True)
    want = dict(zip(u.tolist(), c.tolist()))
    got = dict(zip(out["cell"].tolist(), out["n"].tolist()))
    assert got == want


def test_salted_apply_equals_direct(skewed_cells):
    ds = rd.from_arrow(skewed_cells)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]], "mx": [g["phash"].max()]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]], "mx": [g["mx"].max()]})

    out = SH.salted_group_apply(ds, "cell", fn, merge, hot_threshold=50, k=4).to_pandas()
    direct = (
        skewed_cells.to_pandas().groupby("cell")["phash"].max().reset_index(name="mx")
    )
    got = dict(zip(out["cell"], out["mx"]))
    want = dict(zip(direct["cell"], direct["mx"]))
    assert got == want
