"""ColumnarRenderContext ≡ RenderContext: the columnar build (VERDICT r2 #1) must
emit byte-identical features for every history/predicate/geometry shape —
multipolygons, routes, relation recursion, degenerate ways, deletes, version
ties, cycles — before it may replace the dict context in the render path."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.stages.render import (
    ColumnarRenderContext,
    RenderContext,
    rows_from_arrow,
)

CFG = W.WorldConfig(grid=8, n_images=16, n_batches=4, churn_nodes=8)


def _with_flags(t: pa.Table, flags: np.ndarray) -> pa.Table:
    return t.append_column("in_update", pa.array(flags))


def _assert_equivalent(t: pa.Table):
    dict_ctx = RenderContext(rows_from_arrow(t))
    col_ctx = ColumnarRenderContext(t)
    assert col_ctx.entity_list() == dict_ctx.entity_list()
    fa = dict_ctx.all_features()
    fb = col_ctx.all_features()
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        # geometry tuples hold numpy arrays — compare through the emitted JSON,
        # which is exactly what reaches the ndjson sink
        assert json.dumps(a, separators=(",", ":")) == json.dumps(
            b, separators=(",", ":")
        )


def test_columnar_matches_dict_on_snapshot_world():
    """Whole snapshot (every geometry archetype worldgen makes) as one batch,
    a slice of it flagged in_update."""
    snap = W.snapshot_table(W.WorldConfig(grid=8, n_images=16))
    n = len(snap)
    flags = np.zeros(n, bool)
    flags[:: 3] = True  # every third row "arrived in the update"
    _assert_equivalent(_with_flags(snap, flags))


def test_columnar_matches_dict_on_change_batches():
    """Snapshot + each change batch unioned as (before rows, update rows) —
    multi-version histories, deletes, creates, ripple modifies."""
    snap = W.snapshot_table(CFG)
    for chg in W.change_tables(CFG):
        chg = chg.drop_columns(
            [c for c in ("batch_seq", "action") if c in chg.column_names]
        ).select(snap.column_names)
        t = pa.concat_tables(
            [
                _with_flags(snap, np.zeros(len(snap), bool)),
                _with_flags(chg, np.ones(len(chg), bool)),
            ]
        ).combine_chunks()
        _assert_equivalent(t)


def test_columnar_matches_dict_ties_and_cycles():
    """Hand-built edges the generator doesn't cover: equal-timestamp version
    ties (stable input-order selection), a two-relation membership cycle, a
    way whose nodes resolve only through the before-window fallback."""
    ts = 1_600_000_000_000
    rows = [
        W._el(1, "node", ts, version=1, lat=1.0, lon=1.0),
        W._el(1, "node", ts, version=2, lat=2.0, lon=2.0),  # ts tie with v1
        W._el(2, "node", ts - 5_000, version=1, lat=3.0, lon=3.0),
        W._el(3, "node", ts - 5_000, version=1, lat=4.0, lon=4.0, visible=False),
        W._el(10, "way", ts, version=1, nds=[1, 2]),
        W._el(11, "way", ts, version=1, nds=[1, 99]),  # incomplete: node 99 absent
        # membership cycle 20 ∋ 21 ∋ 20 — kept INCOMPLETE (way 98 missing) so the
        # predicate recursion + cycle guard run but the cycle never renders (a
        # rendered cycle would recurse forever in BOTH implementations — the
        # documented guard covers predicates only, §4.4.3)
        W._el(20, "relation", ts, version=1,
              members=[("relation", 21, ""), ("node", 1, ""), ("way", 98, "")]),
        W._el(21, "relation", ts, version=1, members=[("relation", 20, "")]),
        # 22 ∋ 20: complete (member PRESENCE, not completeness), so 22 renders
        # and its window predicate recurses through the cycle
        W._el(22, "relation", ts, version=1,
              members=[("relation", 20, ""), ("node", 2, "")]),
    ]
    t = W.elements_to_table(rows)
    for pattern in (
        np.array([1, 0, 0, 0, 1, 0, 1, 0, 1], bool),
        np.array([0, 1, 1, 1, 0, 1, 0, 1, 0], bool),
        np.zeros(9, bool),
        np.ones(9, bool),
    ):
        _assert_equivalent(_with_flags(t, pattern))


def test_node_fast_path_matches_features_for():
    """render_entities' vectorized node path must be byte-identical to the
    per-entity features_for + json.dumps route — including escaped users, tags
    with quotes/unicode, null changesets, deletes and sub-second timestamps."""
    from augdiff_pipeline_ray.pipelines.adiff import render_entities
    from augdiff_pipeline_ray.stages import tiles as T

    ts = 1_600_000_000_000
    rows = [
        W._el(1, "node", ts, version=1, lat=1.5, lon=-0.25,
              tags={"name": 'He said "hi" \\ ünïcødé', "k": "v"},
              user='quoted "user" ☃', changeset=7, uid=3),
        W._el(1, "node", ts + 123, version=2, lat=1.25, lon=-0.5,
              user="plain", changeset=8, uid=4),
        W._el(2, "node", ts, version=1, lat=2.0, lon=2.0, visible=False),
        W._el(2, "node", ts + 1_000, version=2, lat=2.0, lon=2.0, visible=False),
        W._el(3, "node", ts, version=1, lat=3.0, lon=3.0),
        W._el(5, "node", ts, version=1),  # visible, coordinate-less → NaN JSON
        W._el(9, "way", ts, version=1, nds=[1, 3]),
    ]
    t = W.elements_to_table(rows)
    flags = np.array([0, 1, 0, 1, 1, 1, 1], bool)
    ctx = ColumnarRenderContext(t, in_update=flags)
    ents = ctx.entity_list()
    orders = list(range(len(ents)))
    types = [e[0] for e in ents]
    ids = [e[1] for e in ents]
    meta, payload = render_entities(ctx, T.CellAssigner(), orders, types, ids)

    # reference: per-entity emission through features_for (the slow path)
    want = []
    for o, tipe, id_ in zip(orders, types, ids):
        for j, f in enumerate(ctx.features_for(tipe, id_)):
            want.append((o * 4 + j, json.dumps(f, separators=(",", ":"))))
    got = sorted(zip(payload["order"].to_pylist(), payload["feature"].to_pylist()))
    assert got == sorted(want)
    # wkb parity for the node features
    from augdiff_pipeline_ray.functions import geom as G

    by_order = dict(zip(payload["order"].to_pylist(), payload["wkb"].to_pylist()))
    for o, fj in want:
        g = G.geojson_to_geom(json.loads(fj)["geometry"])
        assert by_order[o] == G.geom_to_wkb(g)


def test_columnar_empty_table():
    t = _with_flags(W.elements_to_table([]), np.zeros(0, bool))
    ctx = ColumnarRenderContext(t)
    assert ctx.entity_list() == [] and ctx.all_features() == []


def test_columnar_flags_argument_matches_column():
    snap = W.snapshot_table(W.WorldConfig(grid=6, n_images=4))
    flags = np.zeros(len(snap), bool)
    flags[::2] = True
    a = ColumnarRenderContext(_with_flags(snap, flags))
    b = ColumnarRenderContext(snap, in_update=flags)
    assert a.all_features() == b.all_features()
