"""End-to-end golden runs: worldgen → indexer → stream → ndjson + assignments + lineage;
resume produces byte-identical output; distributed render == local render."""

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

from augdiff_pipeline_ray import keys as K
from augdiff_pipeline_ray.pipelines import adiff as AD
from augdiff_pipeline_ray.pipelines import worldgen as W
from augdiff_pipeline_ray.sources import geojson as GJ

CFG = W.WorldConfig(grid=8, n_images=48, n_batches=6, churn_nodes=4)


@pytest.fixture(scope="module")
def world(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("world")
    W.write_world(str(root), CFG)
    return root


@pytest.fixture(scope="module")
def full_run(world, tmp_path_factory):
    out = tmp_path_factory.mktemp("out_full")
    # "force" keeps the distributed render pool exercised even at tiny entity counts
    stats = AD.run_stream(str(world), str(out), num_shards=2, render_concurrency=2,
                          distributed_render="force")
    return out, stats


def _read_all_ndjson(out: Path) -> dict[int, str]:
    res = {}
    for p in sorted((out / "adiff").rglob("*.ndjson")):
        seq = int("".join(p.relative_to(out / "adiff").with_suffix("").parts))
        res[seq] = p.read_text()
    return res


def test_stream_runs_and_emits(full_run):
    out, stats = full_run
    assert len(stats["batches"]) == CFG.n_batches
    nd = _read_all_ndjson(out)
    assert set(nd) == set(range(1, CFG.n_batches + 1))
    total_features = 0
    for seq, text in nd.items():
        for line in text.splitlines():
            f = json.loads(line)
            assert f["type"] == "Feature"
            assert set(f["properties"]) == {
                "id", "type", "tags", "changeset", "timestamp", "uid", "user",
                "version", "visible",
            }
            total_features += 1
    assert total_features > 0


def test_batch1_node_move_ripples(full_run):
    """Batch 1 moves node (0,0): expect the node modify (after+before) and the
    containing building way + new polygon geometry."""
    out, _ = full_run
    text = _read_all_ndjson(out)[1]
    feats = [json.loads(l) for l in text.splitlines()]
    nid = W.node_id(CFG, 0, 0)
    node_feats = [f for f in feats if f["properties"]["id"] == nid and f["properties"]["type"] == "node"]
    assert len(node_feats) == 2  # after + before(visible=false)
    assert node_feats[0]["properties"]["visible"] is True
    assert node_feats[1]["properties"]["visible"] is False
    assert node_feats[0]["geometry"]["coordinates"] != node_feats[1]["geometry"]["coordinates"]
    # the building way referencing that node is swept in by the closure and re-rendered.
    # Reference-compat quirk (SURVEY.md §4.4.1): storage-loaded rows have tags dropped
    # (OrcBackend.scala:105 `&& false`), so the closed building renders as a LineString
    # with empty tags — exactly what the reference produces.
    way_feats = [f for f in feats if f["properties"]["type"] == "way"
                 and f["properties"]["id"] == W.WAY_BUILDING0]
    assert len(way_feats) == 2
    assert way_feats[0]["geometry"]["type"] == "LineString"
    assert way_feats[0]["properties"]["tags"] == {}


def test_delete_emits_single_invisible_before(full_run):
    out, _ = full_run
    text = _read_all_ndjson(out)[3]
    feats = [json.loads(l) for l in text.splitlines()]
    victim = W.node_id(CFG, 2, 2)
    nf = [f for f in feats if f["properties"]["id"] == victim and f["properties"]["type"] == "node"]
    assert len(nf) == 1
    assert nf[0]["properties"]["visible"] is False


def test_two_hop_ripple_rerenders_multipolygon(full_run):
    """Batch 3 moves an inner-ring node → ring way → multipolygon relation re-renders.

    In reference-compat mode the relation's tags are dropped on storage load, so
    ``isMultiPolygon({})`` is false and the member rings fold into a MultiLineString —
    the reference's actual output shape for storage-loaded relations (§4.4.1)."""
    out, _ = full_run
    text = _read_all_ndjson(out)[3]
    feats = [json.loads(l) for l in text.splitlines()]
    mp = [f for f in feats if f["properties"]["id"] == W.REL_MP]
    assert len(mp) == 2  # after + before
    assert mp[0]["geometry"]["type"] == "MultiLineString"


def test_corrected_mode_builds_area_and_multipolygon(world, tmp_path_factory):
    """With drop_tags_on_load=False (the corrected behavior behind the compat flag),
    the building renders as a Polygon and the relation as a polygon-with-hole."""
    out = tmp_path_factory.mktemp("out_correct")
    job = AD.AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2,
                      drop_tags_on_load=False, distributed_render=False,
                      parallel_fetch=False)
    job.run_stream(start=1, end=3)
    job.close()
    feats1 = [json.loads(l) for l in _read_all_ndjson(out)[1].splitlines()]
    way = [f for f in feats1 if f["properties"]["type"] == "way"
           and f["properties"]["id"] == W.WAY_BUILDING0]
    assert way and way[0]["geometry"]["type"] == "Polygon"
    assert way[0]["properties"]["tags"] == {"building": "yes"}
    feats3 = [json.loads(l) for l in _read_all_ndjson(out)[3].splitlines()]
    mp = [f for f in feats3 if f["properties"]["id"] == W.REL_MP]
    g = mp[0]["geometry"]
    assert g["type"] == "Polygon" and len(g["coordinates"]) == 2  # outer + hole


def test_assignments_and_lineage(full_run):
    out, stats = full_run
    asg = pq.read_table(out / "assignments")
    assert set(asg["assignment_kind"].to_pylist()) == {"geometry"}
    assert (np.array(asg["cell"].to_pylist()) >= -1).all()
    base = pq.read_table(out / "tile_assignments_base.parquet")
    assert len(base) == CFG.n_images
    assert set(base["assignment_kind"].to_pylist()) == {"tile"}
    lin = pq.read_table(out / "lineage")
    seqs = set(lin["batch_seq"].to_pylist())
    assert seqs == set(range(0, CFG.n_batches + 1))
    assert set(lin["status"].to_pylist()) == {"committed"}
    # decoded-tile verification ran at bootstrap
    tiles = pq.read_table(out / "tiles_decoded.parquet")
    assert tiles["decode_ok"].to_pylist() == [True] * CFG.n_images
    psnr = np.array(tiles["psnr_db"].to_pylist())
    assert (np.isinf(psnr) | (psnr >= 40.0)).all()


def test_knn_and_overlay_outputs(full_run):
    out, stats = full_run
    knn = pq.read_table(out / "knn")
    assert len(knn) > 0
    assert knn.column_names == ["batch_seq", "key", "rank", "image_id", "dist_m"]
    ov = pq.read_table(out / "overlay")
    assert ov.num_rows >= 0  # overlay may be empty when no tiles share diff cells
    if ov.num_rows:
        assert (np.array(ov["changed_px"].to_pylist()) >= 0).all()


def test_resume_skips_committed_and_is_byte_identical(world, full_run, tmp_path_factory):
    out_full, _ = full_run
    out = tmp_path_factory.mktemp("out_resume")
    # first run: only batches 1..3 (simulated kill after 3)
    job = AD.AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2)
    job.run_stream(start=1, end=3)
    job.close()
    # resumed run: full range — must skip 1..3
    job2 = AD.AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2)
    stats = job2.run_stream()
    job2.close()
    assert stats["skipped"] == [1, 2, 3]
    assert [b["seq"] for b in stats["batches"]] == [4, 5, 6]
    # outputs byte-identical to the uninterrupted run
    nd_a = _read_all_ndjson(out_full)
    nd_b = _read_all_ndjson(out)
    assert nd_a == nd_b
    asg_a = pq.read_table(out_full / "assignments").to_pylist()
    asg_b = pq.read_table(out / "assignments").to_pylist()
    assert asg_a == asg_b


def test_mid_batch_kill_recomputes_cleanly(world, full_run, tmp_path_factory):
    """A kill MID-batch leaves partial outputs but no lineage commit — the resumed run
    must recompute that batch and still produce byte-identical results."""
    out_full, _ = full_run
    out = tmp_path_factory.mktemp("out_midkill")
    job = AD.AdiffJob(str(world), str(out), num_shards=2)
    job.run_stream(start=1, end=2)
    job.close()
    # simulate a crash during batch 3: partial (garbage) ndjson + a stray tmp file,
    # but NO lineage commit for batch 3
    p3 = Path(GJ.batch_json_path(str(out / "adiff" / "AAA" / "BBB" / "CCC.ndjson"), 3))
    p3.parent.mkdir(parents=True, exist_ok=True)
    p3.write_text('{"type":"Feature","TRUNCATED')
    (out / "assignments").mkdir(exist_ok=True)
    (out / "assignments" / "batch-000000003.tmp").write_bytes(b"partial")
    job2 = AD.AdiffJob(str(world), str(out), num_shards=2)
    stats = job2.run_stream()
    job2.close()
    assert stats["skipped"] == [1, 2]
    assert [b["seq"] for b in stats["batches"]] == [3, 4, 5, 6]
    assert _read_all_ndjson(out_full) == _read_all_ndjson(out)
    asg_a = pq.read_table(out_full / "assignments").to_pylist()
    asg_b = pq.read_table(out / "assignments").to_pylist()
    assert asg_a == asg_b


def test_distributed_render_equals_local(world, full_run, tmp_path_factory):
    out_full, _ = full_run
    out = tmp_path_factory.mktemp("out_local")
    AD.run_stream(str(world), str(out), num_shards=2,
                  distributed_render=False, parallel_fetch=False)
    assert _read_all_ndjson(out_full) == _read_all_ndjson(out)


def test_empty_change_batch(world, tmp_path_factory):
    """Real minutely replication produces EMPTY diffs: a batch with zero change
    entities must run the whole pre → render → tail path, write empty-but-valid
    outputs, and commit its lineage (so resume skips it)."""
    import pyarrow as pa

    from augdiff_pipeline_ray.sources import osc as OSC
    from augdiff_pipeline_ray.sources.osc import CHANGE_SCHEMA

    out = tmp_path_factory.mktemp("out_empty")
    world2 = tmp_path_factory.mktemp("world_empty")
    # world with ONE empty change batch: copy snapshot/images, write empty osc 1
    import shutil as sh

    for f in ("snapshot.parquet", "images.parquet"):
        sh.copy(world / f, world2 / f)
    p = world2 / "changes" / (OSC.sequence_path(1) + ".osc")
    p.parent.mkdir(parents=True, exist_ok=True)
    OSC.write_osc(CHANGE_SCHEMA.empty_table(), str(p))

    stats = AD.run_stream(str(world2), str(out), num_shards=2, render_concurrency=2)
    assert len(stats["batches"]) == 1
    b = stats["batches"][0]
    assert b["features"] == 0 and b["update_rows"] == 0
    nd = _read_all_ndjson(out)
    assert nd[1] == ""  # empty, but present (consumer contract)
    # resume: the committed empty batch is skipped
    stats2 = AD.run_stream(str(world2), str(out), num_shards=2)
    assert stats2["skipped"] == [1] and len(stats2["batches"]) == 0


def test_crash_after_durable_writes_before_commit(world, full_run, tmp_path_factory):
    """The async-durability crash window: batch k's memory/index FILES are written and
    the RAM state advanced, but the lineage commit never lands. The resumed run must
    recompute k (its orphaned files are overwritten idempotently; its memory rows dedup
    against the recomputed update with the update's provenance winning) and produce
    byte-identical outputs."""
    out_full, _ = full_run
    out = tmp_path_factory.mktemp("out_durablecrash")
    job = AD.AdiffJob(str(world), str(out), num_shards=2)
    job.run_stream(start=1, end=2)
    # batch 3: run ONLY the pre stage (durable writes incl. async thread), then "crash"
    pre = job._run_pre(3)
    for t in list(job._file_threads.values()):
        t.join()
    job._file_threads.clear()
    job.close()
    assert (out / "memory" / "batch-000000003.parquet").exists()
    assert not (out / "lineage" / "batch-000000003.parquet").exists()

    job2 = AD.AdiffJob(str(world), str(out), num_shards=2)
    stats = job2.run_stream()
    job2.close()
    assert stats["skipped"] == [1, 2]
    assert [b["seq"] for b in stats["batches"]] == [3, 4, 5, 6]
    assert _read_all_ndjson(out_full) == _read_all_ndjson(out)
    asg_a = pq.read_table(out_full / "assignments").to_pylist()
    asg_b = pq.read_table(out / "assignments").to_pylist()
    assert asg_a == asg_b


def test_atomic_pq_write_accepts_file_uri(tmp_path):
    """URI-path sinks route through pyarrow.fs (reference writes HDFS/S3 via the
    Hadoop FS layer); file:// exercises the same code path in-sandbox."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from augdiff_pipeline_ray.pipelines.adiff import _atomic_pq_write

    d = tmp_path / "assign_uri"
    _atomic_pq_write(f"file://{d}", 7, pa.table({"x": [1, 2, 3]}))
    got = pq.read_table(d / "batch-000000007.parquet")
    assert got["x"].to_pylist() == [1, 2, 3]


def test_render_actor_death_mid_stream_is_transparent(world, full_run, tmp_path_factory):
    """Kill one persistent RenderShard actor between batches: max_restarts replays
    the lost actor's render task deterministically, the stream completes, and every
    output byte matches the undisturbed run's."""
    import ray

    from augdiff_pipeline_ray.pipelines.adiff import AdiffJob

    out = tmp_path_factory.mktemp("kill_actor")
    job = AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2,
                   distributed_render="force")
    job.bootstrap()
    job.warm()
    stats1 = job.run_batch(1)
    # one actor of every restartable serving pool dies between batches
    ray.kill(job._render_pool()[0], no_restart=False)
    pool = job._tiles
    ray.kill(pool._actors[0], no_restart=False)
    if pool._bank_actors:
        ray.kill(pool._bank_actors[0], no_restart=False)
    stats2 = job.run_batch(2)
    job.close()
    assert stats1["features"] > 0 and stats2["features"] > 0

    ref, _ = full_run  # the session's undisturbed reference run over the same world
    for rel in sorted(
        p.relative_to(ref) for p in (ref / "adiff").rglob("*.ndjson")
    )[:2]:  # this job ran batches 1-2 only
        got = (out / rel).read_bytes()
        want = (ref / rel).read_bytes()
        assert got == want, f"{rel} diverged after actor death"
    # the kNN / overlay / assignment outputs served by the killed pools match too
    import pyarrow.parquet as _pq

    for fam in ("knn", "overlay", "assignments"):
        for seq in (1, 2):
            f = f"{fam}/batch-{seq:09d}.parquet"
            got = _pq.read_table(out / f)
            want = _pq.read_table(ref / f)
            assert got.equals(want), f"{f} diverged after actor death"


def test_jsontemplate_uri_output(world, tmp_path_factory):
    """Reference --jsontemplate parity with a file:// URI: the stream writes its
    ndjson through the pyarrow-fs sink at the templated location."""
    from augdiff_pipeline_ray.pipelines.adiff import AdiffJob

    out = tmp_path_factory.mktemp("uri_tpl")
    tpl_dir = tmp_path_factory.mktemp("uri_sink")
    job = AdiffJob(str(world), str(out),
                   adiff_template=f"file://{tpl_dir}/AAA/BBB/CCC.ndjson")
    job.bootstrap()
    job.warm()
    stats = job.run_batch(1)
    job.close()
    f = tpl_dir / "000" / "000" / "001.ndjson"
    assert f.exists() and stats["features"] > 0
    assert len(f.read_text().strip().splitlines()) == stats["features"]


def test_osctemplate_uri_source(world, full_run, tmp_path_factory):
    """Reference --osctemplate parity: the stream pulls its OSC batches through the
    templated file:// URI path and produces byte-identical output to the
    directory-layout run over the same world."""
    import pytest as _pytest

    from augdiff_pipeline_ray.pipelines.adiff import AdiffJob

    out = tmp_path_factory.mktemp("osc_tpl")
    tpl = f"file://{world}/changes/AAA/BBB/CCC.osc"
    job = AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2,
                   osc_template=tpl)
    with _pytest.raises(ValueError):
        job.run_stream()  # templated source cannot infer the end sequence
    stats = job.run_stream(start=1, end=2)
    job.close()
    assert [b["seq"] for b in stats["batches"]] == [1, 2]

    ref, _ = full_run
    for rel in sorted(
        p.relative_to(ref) for p in (ref / "adiff").rglob("*.ndjson")
    )[:2]:
        assert (out / rel).read_bytes() == (ref / rel).read_bytes()


def test_augment_shard_death_mid_stream_is_transparent(world, full_run, tmp_path_factory):
    """Kill one persistent AugmentShard between stream segments: the baked
    arg-free constructor (r4 — ray#53727) lets max_restarts replay it, the
    restarted actor rebuilds its snapshot hot-cache from disk, and every output
    byte matches the undisturbed run's."""
    import ray

    from augdiff_pipeline_ray.pipelines.adiff import AdiffJob

    out = tmp_path_factory.mktemp("kill_aug")
    job = AdiffJob(str(world), str(out), num_shards=2, render_concurrency=2,
                   distributed_render="force")
    job.bootstrap()
    job.warm()
    job.run_stream(start=1, end=3)
    ray.kill(job._aug_pool()[0], no_restart=False)
    stats = job.run_stream(start=4, end=6)
    job.close()
    assert all(b["features"] >= 0 for b in stats["batches"])

    ref, _ = full_run
    got = _read_all_ndjson(out)
    want = _read_all_ndjson(ref)
    assert got == want, "stream output diverged after AugmentShard death"
