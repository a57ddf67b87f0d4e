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

    def fn(g: pa.Table) -> pa.Table:
        return pa.table({"cell": g["cell"][:1], "mx": [pa.compute.max(g["phash"])]})

    def merge(g: pa.Table) -> pa.Table:
        return pa.table({"cell": g["cell"][:1], "mx": [pa.compute.max(g["mx"])]})

    out = SH.salted_group_apply(ds, "cell", fn, merge, hot_threshold=50, k=4).to_pandas()
    direct = (
        skewed_cells.to_pandas().groupby("cell")["phash"].max().reset_index(name="mx")
    )
    got = dict(zip(out["cell"], out["mx"]))
    want = dict(zip(direct["cell"], direct["mx"]))
    assert got == want


def test_salted_apply_string_keys_topk(ray_session):
    """String hot keys (every key hot — the event-type shape used by the
    hot_type_value_topk registry query): salted top-k == the direct top-k."""
    rng = np.random.default_rng(3)
    n = 4000
    types = np.asarray(["a", "b", "c"], object)[rng.integers(0, 3, n)]
    vals = rng.random(n)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"ty": pa.array(types), "id": pa.array(ids), "v": pa.array(vals)})

    def topk(g: pa.Table) -> pa.Table:
        v = g["v"].to_numpy(zero_copy_only=False)
        i = g["id"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((i, -v))[:5]
        return pa.table({"ty": g["ty"].take(pa.array(sel)),
                         "id": pa.array(i[sel]), "v": pa.array(v[sel])})

    out = SH.salted_group_apply(
        rd.from_arrow(t).repartition(7), "ty", topk, topk, hot_threshold=10, k=4
    ).to_pandas()
    direct = (
        t.to_pandas().sort_values(["ty", "v", "id"], ascending=[True, False, True])
        .groupby("ty").head(5)
    )
    got = {(r.ty, r.id) for r in out.itertuples()}
    want = {(r.ty, r.id) for r in direct.itertuples()}
    assert got == want


def test_grouped_pairs_sorted_matches_brute(ray_session):
    """Random baskets, forced tiny blocks so groups straddle block boundaries:
    the sorted-block kernel + residual must emit exactly the per-basket
    distinct pairs (and both orientations when asked)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from augdiff_pipeline_ray.stages import shuffle as SH

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 40, 600).astype(np.int64)
    vals = rng.integers(0, 25, 600).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(13)  # many small blocks -> straddling groups

    baskets: dict[int, set] = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        baskets.setdefault(k, set()).add(v)
    want = set()
    for k, vs in baskets.items():
        for a, b in itertools.combinations(sorted(vs), 2):
            want.add((a, b))
    want_multi = {}
    for k, vs in baskets.items():
        for a, b in itertools.combinations(sorted(vs), 2):
            want_multi[(a, b)] = want_multi.get((a, b), 0) + 1

    out = SH.grouped_pairs_sorted(ds, key="k", val="v").to_pandas()
    got_multi = {}
    for a, b in zip(out.x, out.y):
        assert a < b
        got_multi[(a, b)] = got_multi.get((a, b), 0) + 1
    assert got_multi == want_multi  # one emission per (basket, pair)

    both = SH.grouped_pairs_sorted(
        ds, key="k", val="v", both_orientations=True
    ).to_pandas()
    assert len(both) == 2 * len(out)
    fwd = {}
    for a, b in zip(both.x, both.y):
        if a < b:
            fwd[(a, b)] = fwd.get((a, b), 0) + 1
    assert fwd == want_multi


def test_grouped_pairs_sorted_empty_input(ray_session):
    """An empty dataset (e.g. a filter that matched nothing) must yield an empty
    (x, y) dataset, not a concat_tables ValueError (ADVICE r2)."""
    import pyarrow as pa
    import ray.data as rd

    from augdiff_pipeline_ray.stages import shuffle as SH

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out = SH.grouped_pairs_sorted(empty, key="k", val="v")
    assert out.schema().names == ["x", "y"]
    assert len(out.to_pandas()) == 0  # (ray's to_pandas drops schema when empty)
