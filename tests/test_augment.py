"""Unit tests for the augment semi-join/dedup (J5/A3/A4) — priority dedup, OR'd
provenance, deterministic order, and the index-domain/hash-cache equivalences."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from augdiff_pipeline_ray import keys as K
from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.sources import snapshot as SNAP
from augdiff_pipeline_ray.stages import augment as AUG


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("aug_store")
    snap = W.snapshot_table(W.WorldConfig(grid=6, n_images=4))
    SNAP.write_snapshot(rd.from_arrow(snap), str(root / "store"))
    return str(root / "store"), snap


def _bump(t: pa.Table, dv: int) -> pa.Table:
    v = pa.array(t["version"].to_numpy(zero_copy_only=False) + dv)
    return t.set_column(t.schema.get_field_index("version"), "version", v)


def test_augment_dedup_priority_and_flags(store, ray_session):
    root, snap = store
    update = _bump(snap.slice(0, 4), 1)  # 4 new versions of snapshot elements
    # memory holds: the SAME rows as update (dups, lower priority), an older version
    # of a touched element (kept, not-in-update), and a version of an UNtouched
    # element (filtered by the needed-key semi-join)
    memory = pa.concat_tables(
        [update.slice(0, 2), _bump(snap.slice(0, 1), 0), _bump(snap.slice(8, 1), 0)]
    )
    edges = (np.empty(0, np.int64), np.empty(0, np.int64))

    out = AUG.augment_table(update, memory, edges, root)

    key = K.pack_typed(out["id"], out["type"])
    ver = out["version"].to_numpy(zero_copy_only=False)
    flag = out["in_update"].to_numpy(zero_copy_only=False)

    # every update row survives exactly once with in_update=True (memory dups OR in)
    upd_key = K.pack_typed(update["id"], update["type"])
    upd_ver = update["version"].to_numpy(zero_copy_only=False)
    for k, v in zip(upd_key, upd_ver):
        hit = np.nonzero((key == k) & (ver == v))[0]
        assert len(hit) == 1 and flag[hit[0]]

    # the older version of a TOUCHED element is present with in_update=False; the
    # memory row and its tag-dropped storage twin are distinct full rows (the
    # reference-compat drop_tags_on_load quirk), so both survive the dedup
    mk = K.pack_typed(memory["id"], memory["type"])[2]
    hit = np.nonzero((key == mk) & (ver == memory["version"][2].as_py()))[0]
    assert len(hit) >= 1 and not flag[hit].any()

    # the version of an UNtouched element is semi-join filtered out entirely
    uk = K.pack_typed(memory["id"], memory["type"])[3]
    assert uk not in set(key.tolist()) or not np.any(
        (key == uk) & (ver == memory["version"][3].as_py())
    )

    # deterministic order: (type rank, id) non-decreasing, -version within ties
    trank = K.type_code(out["type"])
    ids = out["id"].to_numpy(zero_copy_only=False)
    tup = np.stack([trank, ids], axis=1)
    assert all(
        (tup[i][0], tup[i][1]) <= (tup[i + 1][0], tup[i + 1][1])
        for i in range(len(tup) - 1)
    )


def test_augment_memory_hash_cache_equivalent(store, ray_session):
    root, snap = store
    update = _bump(snap.slice(0, 3), 1)
    memory = pa.concat_tables([update.slice(0, 1), _bump(snap.slice(3, 2), 0)])
    edges = (np.empty(0, np.int64), np.empty(0, np.int64))

    plain = AUG.augment_table(update, memory, edges, root)
    cached = AUG.augment_table(
        update, memory, edges, root, memory_hashes=AUG.row_hashes(memory)
    )
    assert plain.equals(cached)


def test_augment_parts_matches_materialized(store, ray_session):
    root, snap = store
    update = _bump(snap.slice(0, 3), 1)
    edges = (np.empty(0, np.int64), np.empty(0, np.int64))

    big, rep, flag, order = AUG.augment_parts(update, None, edges, root)
    sel = rep[order]
    manual = big.combine_chunks().take(pa.array(sel)).append_column(
        "in_update", pa.array(flag[order])
    )
    assert manual.equals(AUG.augment_table(update, None, edges, root))


def test_dedup_indices_empty():
    rep, flag = AUG._dedup_indices(
        np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, bool)
    )
    assert len(rep) == 0 and len(flag) == 0


def test_node_history_prune_mask():
    # keys: node 10 (3 versions non-update + 1 update), node 11 (tie at max ts),
    # way 20 (2 versions — NEVER pruned), relation 30
    trank = np.array([0, 0, 0, 0, 0, 0, 1, 1, 2])
    ids = np.array([10, 10, 10, 10, 11, 11, 20, 20, 30])
    ts = np.array([5, 3, 1, 2, 7, 7, 1, 9, 4])
    flag = np.array([False, False, False, True, False, False, False, False, False])
    keep = AUG.node_history_prune(trank, ids, ts, flag)
    # node 10: latest non-update (ts=5) + the update row survive; ts=3, ts=1 die
    # node 11: BOTH rows tied at max ts=7 survive (stable-order tie semantics)
    # way/relation rows always survive
    assert keep.tolist() == [True, False, False, True, True, True, True, True, True]


def test_stream_prune_is_byte_identical(ray_session, tmp_path_factory):
    """The stream's node_latest_only render-domain prune must not change ONE byte of
    any output: ndjson features, assignments, knn, overlay. Uses a world whose churn
    revisits the same nodes across batches (multi-version histories)."""
    from pathlib import Path

    from augdiff_pipeline_ray.pipelines import adiff as AD
    from augdiff_pipeline_ray.pipelines import worldgen as W

    root = tmp_path_factory.mktemp("prune_world")
    W.write_world(str(root), W.WorldConfig(grid=8, n_images=48, n_batches=6,
                                           churn_nodes=6))

    def run(prune: bool) -> Path:
        out = tmp_path_factory.mktemp(f"out_prune_{prune}")
        job = AD.AdiffJob(str(root), str(out), num_shards=2, render_concurrency=2,
                          distributed_render="force", node_latest_only=prune)
        try:
            job.run_stream()
        finally:
            job.close()
        return out

    a, b = run(True), run(False)
    files_a = sorted(p.relative_to(a) for p in a.rglob("*.ndjson"))
    files_b = sorted(p.relative_to(b) for p in b.rglob("*.ndjson"))
    assert files_a and files_a == files_b
    for rel in files_a:
        assert (a / rel).read_bytes() == (b / rel).read_bytes(), rel
    import pyarrow.parquet as pq

    for sub in ("assignments", "knn", "overlay"):
        fa = sorted((a / sub).glob("*.parquet"))
        fb = sorted((b / sub).glob("*.parquet"))
        assert [f.name for f in fa] == [f.name for f in fb]
        for x, y in zip(fa, fb):
            assert pq.read_table(x).equals(pq.read_table(y)), (sub, x.name)


def _features_of(parts_result) -> list[dict]:
    from augdiff_pipeline_ray.stages.render import RenderContext, rows_from_arrow

    big, rep, flag, order = parts_result
    sel = rep[order]
    tbl = big.combine_chunks().take(pa.array(sel)).append_column(
        "in_update", pa.array(flag[order])
    )
    return RenderContext(rows_from_arrow(tbl)).all_features()


def test_prune_redelivered_row_keeps_before_window(store, ray_session):
    """A batch that re-delivers a row identical to the tier's newest version turns it
    in_update=True after the dedup OR — the OLDER version is then the true
    before_window and the tier-side latest-only prunes must not drop it."""
    root, snap = store
    nodes = snap.filter(pa.compute.equal(snap["type"], "node"))
    base = nodes.slice(0, 1)

    def at(t: pa.Table, dv: int, dts: int) -> pa.Table:
        t = _bump(t, dv)
        ts = t["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(pa.int64())
        ts = pa.array(ts.to_numpy(zero_copy_only=False) + dts).cast(
            pa.timestamp("ms")).cast(t.schema.field("timestamp").type)
        return t.set_column(t.schema.get_field_index("timestamp"), "timestamp", ts)

    older = at(base, 1, 1000)   # version v+1, older ts
    newest = at(base, 2, 2000)  # version v+2, newest ts
    memory = pa.concat_tables([older, newest])
    update = newest             # re-delivery: byte-identical to the tier's newest
    edges = (np.empty(0, np.int64), np.empty(0, np.int64))

    full = AUG.augment_parts(update, memory, edges, root)
    pruned = AUG.augment_parts(update, memory, edges, root, node_latest_only=True)
    f_full, f_pruned = _features_of(full), _features_of(pruned)
    assert f_full == f_pruned
    # and the case is non-vacuous: the older version must appear as the before-feature
    assert any(not f["properties"]["visible"] or
               f["properties"]["version"] == older["version"][0].as_py()
               for f in f_pruned)
    vers = {f["properties"]["version"] for f in f_pruned}
    assert older["version"][0].as_py() in vers
