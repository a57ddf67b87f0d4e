"""Snapshot store: partitioned sorted write, pruned keyed load, tag-drop compat, memory
append, index store round-trip."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from augdiff_pipeline_ray import keys as K
from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.sources import snapshot as SNAP
from augdiff_pipeline_ray.state.index_store import GROUP_LIMIT, IndexStore, shard_of


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    cfg = W.WorldConfig(grid=10)
    snap = W.snapshot_table(cfg)
    root = tmp_path_factory.mktemp("snapstore")
    SNAP.write_snapshot(rd.from_arrow(snap), str(root / "store"))
    return snap, str(root / "store")


def test_partition_dirs_match_reference_p(store):
    snap, root = store
    parts = SNAP.list_partitions(root)
    want = set(
        K.partition_number_typed(
            snap["id"].to_numpy(zero_copy_only=False),
            snap["type"].to_numpy(zero_copy_only=False),
        ).tolist()
    )
    assert parts == want


def test_files_sorted_by_key(store):
    _, root = store
    import glob

    for f in glob.glob(f"{root}/part=*/keys-*.parquet"):
        keys = pq.read_table(f, columns=["key"])["key"].to_numpy()
        assert (np.diff(keys) >= 0).all()


def test_load_keyed_prunes_and_filters(store):
    snap, root = store
    ids = snap["id"].to_numpy(zero_copy_only=False)
    types = snap["type"].to_numpy(zero_copy_only=False)
    keys = K.pack_typed(ids, types)
    wanted = set(keys[:7].tolist()) | {keys[-1]}
    parts = set(SNAP.parts_of_keys(np.fromiter(wanted, np.int64, len(wanted))).tolist())
    got = SNAP.load_keyed(root, parts, wanted, drop_tags_on_load=True, parallel=False)
    assert set(got["key"].to_pylist()) == wanted
    # reference-compat: tags emptied on load
    assert all(t == [] for t in got["tags"].to_pylist())
    got2 = SNAP.load_keyed(root, parts, wanted, drop_tags_on_load=False, parallel=False)
    orig_tags = {
        k: t for k, t in zip(keys.tolist(), snap["tags"].to_pylist())
    }
    for k, t in zip(got2["key"].to_pylist(), got2["tags"].to_pylist()):
        assert t == orig_tags[k]


def test_load_keyed_parallel_equals_local(store):
    snap, root = store
    keys = K.pack_typed(
        snap["id"].to_numpy(zero_copy_only=False),
        snap["type"].to_numpy(zero_copy_only=False),
    )
    wanted = set(keys[::5].tolist())
    parts = set(SNAP.parts_of_keys(np.fromiter(wanted, np.int64, len(wanted))).tolist())
    a = SNAP.load_keyed(root, parts, wanted, parallel=False)
    b = SNAP.load_keyed(root, parts, wanted, parallel=True)
    assert set(a.column_names) == set(b.column_names)  # paths must agree on schema
    sa = a.sort_by([("key", "ascending"), ("version", "ascending")])
    sb = b.sort_by([("key", "ascending"), ("version", "ascending")]).select(
        sa.column_names
    )
    assert sa.equals(sb)  # full-table equality, not just key multiset


def test_append_rows_idempotent(store, tmp_path):
    snap, _ = store
    root = str(tmp_path / "store2")
    sub = snap.slice(0, 10)
    SNAP.append_rows(sub, root, batch_seq=7)
    SNAP.append_rows(sub, root, batch_seq=7)  # same batch again → same files, no dupes
    total = sum(
        len(pq.read_table(f))
        for f in __import__("glob").glob(f"{root}/part=*/batch-*.parquet")
    )
    assert total == 10


def test_index_store_incremental_and_2hop(ray_session, tmp_path):
    store = IndexStore(str(tmp_path / "idx"), num_shards=3)
    store.write_full(pa.table({"a": pa.array([1, 1, 2], pa.int64()),
                               "b": pa.array([10, 20, 10], pa.int64())}))
    store.start_pool()
    try:
        assert store.load_edges({1}) == {(1, 10), (1, 20), (2, 10)}
        # incremental append reaches both the parquet truth and the live shards
        store.append_batch({(3, 30)}, batch_seq=5)
        assert store.load_edges({3}) == {(3, 30)}
        # chunking boundary: > GROUP_LIMIT touched keys
        touched = set(range(1000, 1000 + GROUP_LIMIT + 10))
        assert store.load_edges(touched) == set()
    finally:
        store.stop_pool()


def test_shard_of_spreads():
    keys = (np.arange(10_000, dtype=np.int64) << 2) | (np.arange(10_000) % 3)
    s = shard_of(keys, 8)
    counts = np.bincount(s, minlength=8)
    assert counts.min() > 500


def test_storage_format_dispatch(ray_session, tmp_path, monkeypatch):
    """Format chokepoint: parquet path round-trips; lance requests fail loudly (no
    lance package in this container) instead of silently reading parquet."""
    import augdiff_pipeline_ray.sources as SRC

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    monkeypatch.delenv("AUGDIFF_STORAGE_FORMAT", raising=False)
    assert SRC.storage_format(p) == "parquet"
    assert SRC.storage_format("/data/snapshot.lance") == "lance"
    ds = SRC.read_dataset(p, columns=["x"])
    assert sorted(r["x"] for r in ds.take_all()) == [1, 2, 3]
    out = str(tmp_path / "out")
    SRC.write_dataset(ds, out)
    assert len(pq.read_table(out)) == 3
    with pytest.raises(ImportError, match="lance"):
        SRC.read_dataset("/data/snapshot.lance")
    monkeypatch.setenv("AUGDIFF_STORAGE_FORMAT", "lance")
    assert SRC.storage_format(p) == "lance"
    with pytest.raises(ImportError, match="stand-in"):
        SRC.read_dataset(p)


def test_lance_dispatch_contract_fake_fs(ray_session, tmp_path, monkeypatch):
    """Fake-fs contract for the Lance seam (VERDICT r3 #5 — the package can't be
    installed in-sandbox): with a stub ``lance`` module importable and the Ray
    entry points monkeypatched, ``read_dataset``/``write_dataset`` must route
    through ``read_lance``/``write_lance`` with the caller's path/columns/kwargs,
    and the returned Dataset must flow through a normal pipeline — proving the
    swap-at-the-chokepoint claim, not just the error message."""
    import sys
    import types

    import ray.data as rd

    import augdiff_pipeline_ray.sources as SRC

    t = pa.table({"x": pa.array([3, 1, 2], pa.int64()),
                  "y": pa.array(["a", "b", "c"])})
    backing = str(tmp_path / "backing.parquet")
    pq.write_table(t, backing)
    calls = {}

    def fake_read_lance(path, columns=None, **kwargs):
        calls["read"] = {"path": path, "columns": columns, **kwargs}
        return rd.read_parquet(backing, columns=columns)

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)

    written = {}

    def fake_write_lance(self, path, **kwargs):
        written["path"] = path
        self.write_parquet(str(tmp_path / "out_pq"))

    monkeypatch.setattr(rd.Dataset, "write_lance", fake_write_lance, raising=False)

    monkeypatch.setenv("AUGDIFF_STORAGE_FORMAT", "lance")
    ds = SRC.read_dataset("/data/snapshot.lance", columns=["x"])
    assert calls["read"] == {"path": "/data/snapshot.lance", "columns": ["x"]}
    # the dispatched Dataset behaves like any other source in a pipeline
    out = ds.map_batches(
        lambda b: pa.table({"x2": pa.compute.multiply(b["x"], 2)}),
        batch_format="pyarrow",
    )
    assert sorted(r["x2"] for r in out.take_all()) == [2, 4, 6]
    SRC.write_dataset(out, "/data/out.lance")
    assert written["path"] == "/data/out.lance"
    assert len(pq.read_table(str(tmp_path / "out_pq"))) == 3


def test_latest_merge_matches_full_recompute():
    """Incremental latest-version metadata merge == whole-table recompute, across
    random key/ts streams with hot keys, ties, and mixed node/way rows."""
    import numpy as np

    from augdiff_pipeline_ray import keys as K
    from augdiff_pipeline_ray.sources.snapshot import _latest_merge, _node_latest_mask

    rng = np.random.default_rng(7)
    for trial in range(20):
        n0, n1 = rng.integers(1, 400, 2)
        def mk(n):
            ids = rng.integers(0, 40, n)
            code = rng.choice([0, 0, 0, 1, 2], n)  # node-heavy
            keys = (ids.astype(np.int64) << 2) | code
            ts = rng.integers(0, 50, n).astype(np.int64)  # many ties
            return keys, ts
        k0, t0 = mk(n0)
        k1, t1 = mk(n1)
        meta0 = (k0, t0, K.mix_key_ts(k0, t0), _node_latest_mask(k0, t0))
        merged = _latest_merge(meta0, k1, t1)
        ka, ta = np.concatenate([k0, k1]), np.concatenate([t0, t1])
        want = _node_latest_mask(ka, ta)
        assert (merged[0] == ka).all() and (merged[1] == ta).all()
        assert (merged[3] == want).all(), trial
        assert (merged[2] == K.mix_key_ts(ka, ta)).all()


def test_load_keyed_node_latest_only_all_paths(store, tmp_path_factory, ray_session):
    """node_latest_only must behave identically on the three load_keyed paths
    (whole-table cache, pads dataset, parallel Ray read): keep only each node key's
    max-ts versions, keep way/relation history whole, and keep protect_mix suspects
    AND the rows they would otherwise suppress."""
    snap, _ = store
    root = str(tmp_path_factory.mktemp("latest_store") / "store")
    # multi-version store: 3 versions of every row, distinct ts; build from rd
    def bump(t, dv, dts):
        v = pa.array(t["version"].to_numpy(zero_copy_only=False) + dv)
        ts = t["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(pa.int64())
        ts = pa.array(ts.to_numpy(zero_copy_only=False) + dts).cast(
            pa.timestamp("ms")).cast(t.schema.field("timestamp").type)
        t = t.set_column(t.schema.get_field_index("version"), "version", v)
        return t.set_column(t.schema.get_field_index("timestamp"), "timestamp", ts)

    multi = pa.concat_tables([snap, bump(snap, 1, 1000), bump(snap, 2, 2000)])
    SNAP.write_snapshot(rd.from_arrow(multi), root)

    keys = np.unique(K.pack_typed(snap["id"], snap["type"]))
    parts = set(SNAP.parts_of_keys(keys).tolist())

    def norm(t):
        return sorted(zip(t["key"].to_pylist(), t["version"].to_pylist(),
                          t["timestamp"].to_pylist()))

    results = {}
    for name, kw in (
        ("cached", dict(parallel=False)),
        ("pads", dict(parallel=False)),
        ("parallel", dict(parallel=True)),
    ):
        SNAP.invalidate_pads_cache(root)
        if name == "pads":  # force the pads path by forbidding the whole-table cache
            old = SNAP.TABLE_CACHE_MAX_BYTES
            SNAP.TABLE_CACHE_MAX_BYTES = 0
        try:
            results[name] = SNAP.load_keyed(root, parts, keys,
                                            node_latest_only=True, **kw)
        finally:
            if name == "pads":
                SNAP.TABLE_CACHE_MAX_BYTES = old
    SNAP.invalidate_pads_cache(root)

    a, b, c = (norm(results[n]) for n in ("cached", "pads", "parallel"))
    assert a == b == c
    got = results["cached"]
    gk = got["key"].to_numpy(zero_copy_only=False)
    gts = got["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(
        pa.int64()).to_numpy(zero_copy_only=False)
    full = SNAP.load_keyed(root, parts, keys, parallel=False)
    fk = full["key"].to_numpy(zero_copy_only=False)
    fts = full["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(
        pa.int64()).to_numpy(zero_copy_only=False)
    for k in keys:
        if k & 3 == 0:  # node: only the max-ts version survives
            assert set(gts[gk == k]) == {fts[fk == k].max()}, k
        else:  # way/relation: full history survives
            assert (gk == k).sum() == (fk == k).sum(), k

    # protect_mix: mark every key's NEWEST version suspect → the middle version
    # must re-appear (the suspect neither prunes nor suppresses), on all paths
    nk = keys[(keys & 3) == 0][:5]
    sel = np.isin(fk, nk)
    newest_ts = np.array([fts[fk == k].max() for k in nk])
    pm = np.sort(K.mix_key_ts(nk, newest_ts))
    for name, kw in (("cached", dict(parallel=False)), ("parallel", dict(parallel=True))):
        SNAP.invalidate_pads_cache(root)
        got_p = SNAP.load_keyed(root, parts, nk, node_latest_only=True,
                                protect_mix=pm, **kw)
        pk = got_p["key"].to_numpy(zero_copy_only=False)
        pts = got_p["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        for k, mx in zip(nk, newest_ts):
            have = set(pts[pk == k].tolist())
            rest = fts[(fk == k)]
            second = rest[rest < mx].max()
            assert have == {int(mx), int(second)}, (name, k, have)
    SNAP.invalidate_pads_cache(root)
