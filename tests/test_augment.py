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
