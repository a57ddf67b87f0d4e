"""Image codec invariants, STRtree, PIP assignment, kNN, overlay kernels."""

import numpy as np
import pyarrow as pa

from augdiff_pipeline_ray import cells as C
from augdiff_pipeline_ray import georef
from augdiff_pipeline_ray.functions import image as IMG
from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.stages import tiles as T
from augdiff_pipeline_ray.state.strtree import STRtree


def test_codec_lossless_roundtrip():
    px = IMG.synth_pixels("img-x", 64, 48)
    back, fmt = IMG.decode(IMG.encode(px, "rawz"))
    assert fmt == "rawz"
    assert np.array_equal(px, back)
    assert IMG.psnr(px, back) == float("inf")


def test_codec_lossy_psnr_at_least_40():
    for iid in ("img-a", "img-b", "img-c"):
        px = IMG.synth_pixels(iid, 128, 128)
        back, fmt = IMG.decode(IMG.encode(px, "qz"))
        assert fmt == "qz"
        assert IMG.psnr(px, back) >= 40.0, IMG.psnr(px, back)


def test_synth_pixels_deterministic():
    a = IMG.synth_pixels("img-00000007", 64, 64)
    b = IMG.synth_pixels("img-00000007", 64, 64)
    assert np.array_equal(a, b)
    assert IMG.phash64(a) == IMG.phash64(b)


def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(3)
    boxes = np.sort(rng.uniform(0, 100, (500, 4)).reshape(500, 2, 2), axis=1).transpose(
        0, 2, 1
    ).reshape(500, 4)[:, [0, 2, 1, 3]]
    # boxes now [xmin, ymin, xmax, ymax] — rebuild properly to be safe
    lo = rng.uniform(0, 90, (500, 2))
    ext = rng.uniform(0.1, 10, (500, 2))
    boxes = np.hstack([lo, lo + ext])  # xmin ymin xmax ymax
    tree = STRtree(boxes)
    for _ in range(50):
        q = rng.uniform(0, 100, 2)
        got = set(tree.query_point(q[0], q[1]).tolist())
        want = set(
            np.nonzero(
                (boxes[:, 0] <= q[0]) & (boxes[:, 2] >= q[0])
                & (boxes[:, 1] <= q[1]) & (boxes[:, 3] >= q[1])
            )[0].tolist()
        )
        assert got == want


def test_cell_assigner_matches_arithmetic():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-80, 80, 200)
    lon = rng.uniform(-179, 179, 200)
    asg = T.CellAssigner()
    got = asg.assign_points(lat, lon)
    want = C.cell_of(lat, lon)
    assert (got == want).all()


def test_worldgen_images_deterministic_and_verifiable():
    cfg = W.WorldConfig(n_images=32)
    t1 = W.images_table(cfg)
    t2 = W.images_table(cfg)
    assert t1.equals(t2)
    # per-row invariant: decode → PSNR + caption equality
    for rec in t1.to_pylist():
        px, fmt = IMG.decode(rec["bytes"])
        assert fmt == rec["fmt"]
        ref = IMG.synth_pixels(rec["image_id"], rec["w"], rec["h"])
        if fmt == "rawz":
            assert np.array_equal(px, ref)
        else:
            assert IMG.psnr(ref, px) >= 40.0
    # hot cells: ~30% of images in 2 cells
    cells = georef.cell_of_image(t1["phash"])
    _, counts = np.unique(cells, return_counts=True)
    # the 2 hot clusters may straddle up to 4 fine-res cells; skew must still be visible
    top4 = np.sort(counts)[-4:].sum()
    assert top4 >= 0.2 * len(t1)
    assert counts.max() >= 4 * np.median(counts)


def test_knn_against_tiles():
    cfg = W.WorldConfig(n_images=64)
    t = W.images_table(cfg)
    lat, lon = georef.centroid(t["phash"])
    cells = georef.cell_of_image(t["phash"])
    ids = t["image_id"].to_pylist()
    res = T.knn_against_tiles(lat[:5], lon[:5], cells, lat, lon, ids, k=3)
    assert len(res) == 5
    for i, neigh in enumerate(res):
        assert len(neigh) >= 1
        # the tile's own position is at distance 0 (ties share quantized georef positions)
        assert neigh[0][1] == 0.0
        dists = [d for _, d in neigh]
        assert dists == sorted(dists)


def test_overlay_rasterize():
    px = IMG.synth_pixels("img-ov", 64, 64)
    bbox = (10.0, 10.1, 20.0, 20.1)
    square = np.array(
        [[20.02, 10.02], [20.08, 10.02], [20.08, 10.08], [20.02, 10.08], [20.02, 10.02]]
    )
    out, changed = T.rasterize_geom_on_tile(px, bbox, ("Polygon", [square]))
    assert changed > 0
    assert not np.array_equal(out, px)
    # geometry fully outside → no change
    far = square + 5.0
    out2, changed2 = T.rasterize_geom_on_tile(px, bbox, ("Polygon", [far]))
    assert changed2 == 0 and np.array_equal(out2, px)


def test_knn_ring_loop_matches_brute_with_ties():
    """The ring/escalation path (exercised when Q·n exceeds the brute shortcut) must
    be exactly equal — ids AND distances, ties broken by id — to the brute kernel.
    Includes duplicated positions (exact distance ties) so the id-rank tie-break in
    the integer candidate path is actually exercised."""
    rng = np.random.default_rng(7)
    n = 6000
    lat = rng.uniform(10.0, 10.3, n)
    lon = rng.uniform(20.0, 20.3, n)
    lat[1000:2000] = lat[:1000]
    lon[1000:2000] = lon[:1000]  # exact position ties
    ids = np.array([f"img-{i:06d}" for i in rng.permutation(n)])
    cells = C.cell_of(lat, lon)
    q = 800  # Q*n = 4.8M > 1<<22 -> takes the ring/escalation loop
    qlat = np.repeat(lat[::37] + 0.0004, 5)[:q]
    qlon = np.repeat(lon[::37] - 0.0003, 5)[:q]
    ring_ids, ring_d = T.knn_arrays(qlat, qlon, cells, lat, lon, ids, k=4, expand=True)
    b_ids, b_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 4)
    assert np.array_equal(ring_ids, b_ids)
    assert np.allclose(ring_d, b_d)


def test_knn_metre_near_ties_at_large_coordinates():
    """Regression for the r4 float32 shadow-coordinate prefilter: at (45°N, 120°E)
    float32 lat/lon carries ~1 m of absolute position error (ulp(120°) ≈ 1e-5°), so a
    RELATIVE guard band on float32 distances pruned true contenders whose exact
    distances differ at metre scale. Clusters of tiles at radii 1.0 m + i·0.1 m around
    each query must come back in exact order — both the expand=True escalation path
    and the fixed-ring expand=False path (clusters are metres wide, whole clusters sit
    inside ring 1, and other clusters are kilometres away, so ring-1 top-k == global
    brute top-k)."""
    rng = np.random.default_rng(45)
    n_anchor, per = 500, 12
    alat = rng.uniform(44.8, 45.2, n_anchor)
    alon = rng.uniform(119.8, 120.2, n_anchor)
    deg_m = 1.0 / 111_320.0  # ~1 metre in degrees
    radii = (1.0 + 0.1 * np.arange(per)) * deg_m
    theta = rng.uniform(0, 2 * np.pi, (n_anchor, per))
    lat = (alat[:, None] + radii[None, :] * np.sin(theta)).ravel()
    lon = (alon[:, None] + radii[None, :] * np.cos(theta) /
           np.cos(np.radians(alat))[:, None]).ravel()
    n = len(lat)
    ids = np.array([f"img-{i:06d}" for i in rng.permutation(n)])
    cells = C.cell_of(lat, lon)
    q = 800  # Q·n = 4.8M > 1<<22 → expand=True takes the ring loop, not brute
    qlat = np.concatenate([alat, alat[: q - n_anchor] + 0.3 * deg_m])
    qlon = np.concatenate([alon, alon[: q - n_anchor]])
    b_ids, b_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 3)
    e_ids, e_d = T.knn_arrays(qlat, qlon, cells, lat, lon, ids, k=3, expand=True)
    assert np.array_equal(e_ids, b_ids)
    assert np.allclose(e_d, b_d)
    f_ids, f_d = T.knn_arrays(qlat, qlon, cells, lat, lon, ids, k=3, ring=1,
                              expand=False)
    assert np.array_equal(f_ids, b_ids)
    assert np.allclose(f_d, b_d)


def test_tile_pool_sparse_straggler_exact(tmp_path):
    """The serving pool's full scatter → routed rings → brute-straggler path must be
    EXACTLY the global brute top-k (ids and distances, ties by id) on a sparse
    multi-cluster layout where mid-gap queries cannot be coverage-guaranteed by the
    first ring rounds — the escalation/brute machinery, not just the kernel."""
    import pyarrow.parquet as pq

    from augdiff_pipeline_ray.state.tile_pool import TilePool

    rng = np.random.default_rng(11)

    def phash_of(lat, lon):
        lo = np.round((np.asarray(lon) + 180.0) / 360.0 * 65536.0).astype(np.int64)
        la = np.round((np.asarray(lat) + 90.0) / 180.0 * 32768.0).astype(np.int64)
        return (la << 16) | (lo & 0xFFFF)

    centers = [(10.0, 20.0), (10.0, 20.5), (10.5, 20.25)]
    lat_parts, lon_parts = [], []
    for cla, clo in centers:
        lat_parts.append(cla + rng.normal(0, 0.01, 30))
        lon_parts.append(clo + rng.normal(0, 0.01, 30))
    # exact-position duplicates to exercise the (dist, id) tie-break through the pool
    lat_parts.append(lat_parts[0][:5])
    lon_parts.append(lon_parts[0][:5])
    ph = phash_of(np.concatenate(lat_parts), np.concatenate(lon_parts))
    lat, lon = georef.centroid(ph)  # quantized — both sides see these coords
    ids = np.array([f"img-{i:05d}" for i in range(len(ph))])
    tbl = pa.table(
        {"image_id": pa.array(ids), "cell": pa.array(georef.cell_of_image(ph)),
         "phash": pa.array(ph)}
    )
    path = str(tmp_path / "tiles_decoded.parquet")
    pq.write_table(tbl, path)

    # queries: on-cluster, mid-gap (straggler: nearest tiles dozens of cells away),
    # and outside the occupied bbox
    qlat = np.array([10.0, 10.01, 10.0, 10.25, 10.25, 9.0, 11.2])
    qlon = np.array([20.0, 20.01, 20.25, 20.25, 20.4, 19.0, 21.5])

    pool = TilePool(path, None, num_shards=3)
    try:
        pool.warm()
        got_ids, got_d = pool.knn(qlat, qlon, 5)
    finally:
        pool.close()
    want_ids, want_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 5)
    assert np.array_equal(got_ids.astype("U32"), want_ids.astype("U32"))
    assert np.allclose(got_d, want_d)


def test_tile_pool_numeric_id_mode_matches_strings(tmp_path):
    """Fixed-width ``img-%08d`` ids trigger the numeric-id fast path (shards
    reply int64, the merge sorts numbers); the pool API must return the
    IDENTICAL strings and distances as the brute string path, ties included."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from augdiff_pipeline_ray import georef
    from augdiff_pipeline_ray.state.tile_pool import TilePool

    def phash_of(lat, lon):
        lo = np.round((np.asarray(lon) + 180.0) / 360.0 * 65536.0).astype(np.int64)
        la = np.round((np.asarray(lat) + 90.0) / 180.0 * 32768.0).astype(np.int64)
        return (la << 16) | (lo & 0xFFFF)

    rng = np.random.default_rng(5)
    lat0 = 10.0 + rng.normal(0, 0.02, 80)
    lon0 = 20.0 + rng.normal(0, 0.02, 80)
    # exact duplicates to force (dist, id) ties through the numeric merge
    lat0 = np.concatenate([lat0, lat0[:6]])
    lon0 = np.concatenate([lon0, lon0[:6]])
    ph = phash_of(lat0, lon0)
    lat, lon = georef.centroid(ph)
    ids = np.array([f"img-{i:08d}" for i in range(len(ph))])
    tbl = pa.table(
        {"image_id": pa.array(ids), "cell": pa.array(georef.cell_of_image(ph)),
         "phash": pa.array(ph)}
    )
    path = str(tmp_path / "tiles_decoded.parquet")
    pq.write_table(tbl, path)
    qlat = np.array([10.0, 10.005, 10.02, 9.9])
    qlon = np.array([20.0, 20.005, 19.98, 20.1])
    pool = TilePool(path, None, num_shards=3)
    try:
        pool.warm()
        assert pool._numeric_mode() is True  # the fast path actually engaged
        raw_ids, _ = pool.knn_finish(pool.knn_scatter(qlat, qlon, 4))
        assert raw_ids.dtype.kind in "iu"  # shards replied int64
        got_ids, got_d = pool.knn(qlat, qlon, 4)
    finally:
        pool.close()
    want_ids, want_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 4)
    assert np.array_equal(got_ids.astype("U32"), want_ids.astype("U32"))
    assert np.allclose(got_d, want_d)


def test_resize_bilinear_invariants():
    """Constant image stays constant at any size; identity size is exact; a pure
    horizontal gradient stays monotone along x after downsample."""
    from augdiff_pipeline_ray.functions import image as IMG

    const = np.full((24, 20, 3), 77, np.uint8)
    out = IMG.resize_bilinear(const, 7, 5)
    assert out.shape == (7, 5, 3) and (out == 77).all()
    px = IMG.synth_pixels("rz", 16, 12)
    assert IMG.resize_bilinear(px, 12, 16) is px  # identity: zero-copy
    grad = np.tile(np.arange(64, dtype=np.uint8)[None, :, None] * 4, (8, 1, 3))
    small = IMG.resize_bilinear(grad, 4, 9).astype(np.int64)
    assert (np.diff(small[:, :, 0], axis=1) > 0).all()


def test_frame_container_and_sampling():
    """ADV1 pack/slice round-trips each frame exactly; sampled indices are
    deterministic, sorted-unique, and cover the strip centers."""
    from augdiff_pipeline_ray.functions import image as IMG

    frames = [IMG.encode(IMG.synth_pixels(f"v#f{f}", 8, 6), "rawz") for f in range(5)]
    blob = IMG.pack_frames(frames)
    assert IMG.frame_count(blob) == 5
    for f in range(5):
        assert bytes(IMG.frame_slice(blob, f)) == frames[f]
        px, fmt = IMG.decode(IMG.frame_slice(blob, f))
        assert fmt == "rawz" and np.array_equal(px, IMG.synth_pixels(f"v#f{f}", 8, 6))
    assert IMG.sample_frame_indices(6, 3).tolist() == [1, 3, 5]
    assert IMG.sample_frame_indices(2, 5).tolist() == [0, 1]
    assert IMG.sample_frame_indices(0, 3).tolist() == []
    # memoryview input works end-to-end (the sampler's zero-copy path)
    mv = memoryview(blob)
    assert IMG.frame_count(mv) == 5
    assert bytes(IMG.frame_slice(mv, 2)) == frames[2]


def test_resize_and_frame_sample_stages(ray_session):
    """TileResizer / FrameSampler actor stages over a tiny images table: layout,
    blob integrity (decode the thumbnail back), sampled-frame PSNR vs source."""
    import ray.data as rd

    from augdiff_pipeline_ray.functions import image as IMG
    from augdiff_pipeline_ray.stages import tiles as T

    ids = [f"img{i:03d}" for i in range(6)]
    rows = {
        "image_id": ids,
        "w": [20] * 6,
        "h": [16] * 6,
        "bytes": [IMG.encode(IMG.synth_pixels(i, 20, 16), "rawz") for i in ids],
    }
    ds = rd.from_arrow(pa.table(rows))
    out = ds.map_batches(
        T.TileResizer, fn_constructor_args=(8, 8), batch_format="pyarrow",
        concurrency=1, num_cpus=1,
    ).take_all()
    assert len(out) == 6 and all(r["resize_ok"] for r in out)
    px, fmt = IMG.decode(out[0]["bytes"])
    assert px.shape == (8, 8, 3) and fmt == "rawz"
    want = IMG.resize_bilinear(IMG.synth_pixels(out[0]["image_id"], 20, 16), 8, 8)
    assert np.array_equal(px, want)

    vids = {
        "image_id": ids,
        "video": [
            IMG.pack_frames(
                [IMG.encode(IMG.synth_pixels(f"{i}#f{f}", 12, 10), "qz") for f in range(6)]
            )
            for i in ids
        ],
    }
    sampled = rd.from_arrow(pa.table(vids)).map_batches(
        T.FrameSampler, fn_constructor_args=(3,), batch_format="pyarrow",
        concurrency=1, num_cpus=1,
    ).take_all()
    assert len(sampled) == 18  # 3 frames × 6 videos
    assert sorted({r["frame_idx"] for r in sampled}) == [1, 3, 5]
    assert all(r["n_frames"] == 6 and r["psnr_db"] >= 40.0 for r in sampled)


def test_configured_decoder_class_restart_contract(ray_session):
    """stages.tiles.configured(): the baked subclass constructs with NO arguments
    (nothing constructor-shaped in the object store → an actor restart can always
    replay __init__, ray#53727) and behaves identically to kwargs construction —
    both as a plain instance and spawned as an arg-free Ray actor."""
    import ray

    from augdiff_pipeline_ray.functions import image as IMG
    from augdiff_pipeline_ray.stages import tiles as T

    cls = T.configured(T.TileDecoder, verify_rate=2, feature_passes=8)
    inst = cls()  # no args by construction
    assert inst.verify_rate == 2 and inst.feature_passes == 8

    ids = [f"cfg{i}" for i in range(6)]
    batch = pa.table(
        {
            "image_id": pa.array(ids),
            "bytes": pa.array(
                [IMG.encode(IMG.synth_pixels(i, 16, 16), "qz") for i in ids],
                pa.binary(),
            ),
            "cell": pa.array(np.arange(6, dtype=np.int64)),
            "phash": pa.array(np.arange(6, dtype=np.int64)),
            "w": pa.array(np.full(6, 16, np.int32)),
            "h": pa.array(np.full(6, 16, np.int32)),
            "fmt": pa.array(["qz"] * 6),
            "caption": pa.array([f"cap {i}" for i in ids]),
        }
    )
    def _eq(x: pa.Table, y: pa.Table) -> bool:
        if x.column_names != y.column_names:
            return False
        for c in x.column_names:
            a, b = x[c].to_pandas(), y[c].to_pandas()
            if a.dtype.kind == "f":
                if not np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True):
                    return False
            elif not a.equals(b):
                return False
        return True

    want = T.TileDecoder(verify_rate=2, feature_passes=8)(batch)
    assert _eq(inst(batch), want)

    # spawned as an actor with no constructor args: kill + restart replays cleanly
    A = ray.remote(max_restarts=1, max_task_retries=1)(cls)
    a = A.remote()
    first = ray.get(a.__call__.remote(batch))
    ray.kill(a, no_restart=False)
    replay = ray.get(a.__call__.remote(batch))
    assert _eq(first, replay) and _eq(first, want)


def test_knn_quad_random_worlds_pool_kernel_exact():
    """Randomized densities/cluster layouts: the quad round-0 kernel's
    coverage-resolved answers must equal brute exactly, across density regimes
    (sparse → the quad resolves little; dense → nearly everything)."""
    for seed, n, spread in ((1, 2000, 0.05), (2, 20000, 0.2), (3, 500, 2.0)):
        rng = np.random.default_rng(seed)
        lat = rng.uniform(-60, 60, n) * spread / 2.0
        lon = rng.uniform(-170, 170, n) * spread / 2.0
        ids = np.array([f"img-{i:06d}" for i in rng.permutation(n)])
        cells = C.cell_of(lat, lon)
        q = 300
        qi = rng.integers(0, n, q)
        qlat = lat[qi] + rng.normal(0, 1e-3, q)
        qlon = lon[qi] + rng.normal(0, 1e-3, q)
        qids_, qd = T.knn_quad_arrays(qlat, qlon, cells, lat, lon, ids, k=3)
        cov = T.quad_coverage_m(qlat, qlon)
        resolved = np.isfinite(qd[:, -1]) & (qd[:, -1] <= cov)
        b_ids, b_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 3)
        assert np.array_equal(qids_[resolved], b_ids[resolved]), seed
        assert np.allclose(qd[resolved], b_d[resolved]), seed


def test_tile_pool_dense_quad_round_exact(tmp_path):
    """DENSE world through the full pool (scatter → quad round 0 → ring rounds):
    at ~thousands of tiles in a small box, nearly every query resolves in the
    quad round, so this pins the round-0 merge + coverage test + shard routing
    against global brute — the sparse test above exercises the opposite regime."""
    import pyarrow.parquet as pq

    from augdiff_pipeline_ray.state.tile_pool import TilePool

    rng = np.random.default_rng(19)

    def phash_of(lat, lon):
        lo = np.round((np.asarray(lon) + 180.0) / 360.0 * 65536.0).astype(np.int64)
        la = np.round((np.asarray(lat) + 90.0) / 180.0 * 32768.0).astype(np.int64)
        return (la << 16) | (lo & 0xFFFF)

    n = 4000
    ph = phash_of(rng.uniform(9.8, 10.4, n), rng.uniform(19.8, 20.6, n))
    lat, lon = georef.centroid(ph)
    ids = np.array([f"img-{i:05d}" for i in rng.permutation(n)])
    tbl = pa.table(
        {"image_id": pa.array(ids), "cell": pa.array(georef.cell_of_image(ph)),
         "phash": pa.array(ph)}
    )
    path = str(tmp_path / "tiles_decoded.parquet")
    pq.write_table(tbl, path)

    q = 200
    qi = rng.integers(0, n, q)
    qlat = lat[qi] + rng.normal(0, 5e-4, q)
    qlon = lon[qi] + rng.normal(0, 5e-4, q)
    pool = TilePool(path, None, num_shards=4)
    try:
        pool.warm()
        got_ids, got_d = pool.knn(qlat, qlon, 3)
    finally:
        pool.close()
    want_ids, want_d = T._knn_brute_arrays(qlat, qlon, lat, lon, ids, 3)
    assert np.array_equal(got_ids.astype("U32"), want_ids.astype("U32"))
    assert np.allclose(got_d, want_d)
