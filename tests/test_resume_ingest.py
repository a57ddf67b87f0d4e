"""Bootstrap tile-ingest resume: the direct-read decode commits one part file per
input file (stages/tiles.py::TileDecoderFilesSink), so a killed ingest re-decodes
only the missing parts — the north rule's skip-finished-partitions resume applied
to the bootstrap's long pole. The manifest pins the input set + decode parameters;
a changed world voids the committed parts instead of silently mixing them."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from augdiff_pipeline_ray.pipelines import indexer as IDX
from augdiff_pipeline_ray.pipelines import worldgen as W

N_FILES = 8
PER_FILE = 64


def _images_dir(tmp_path, n_files: int = N_FILES) -> str:
    cfg = W.WorldConfig(grid=16, n_images=n_files * PER_FILE, n_batches=1, churn_nodes=4)
    t = W.images_table(cfg)
    d = Path(tmp_path) / "images.parquet"
    d.mkdir()
    for i in range(n_files):
        pq.write_table(t.slice(i * PER_FILE, PER_FILE), d / f"img-{i:03d}.parquet")
    return str(d)


def test_ingest_resumes_skipping_finished_parts(ray_session, tmp_path):
    imgs = _images_dir(tmp_path)
    out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"
    ref = IDX.assign_tiles(imgs, str(out_b), concurrency=2)  # fresh single-run reference

    IDX.assign_tiles(imgs, str(out_a), concurrency=2)
    tiles = out_a / "tiles_decoded.parquet"
    parts = sorted(tiles.glob("part-*.parquet"))
    assert len(parts) == N_FILES  # direct-read path actually taken

    # simulate a crash that lost three parts mid-ingest
    for p in parts[:3]:
        p.unlink()
    untouched = {p.name: p.stat().st_mtime_ns for p in parts[3:]}

    r2 = IDX.assign_tiles(imgs, str(out_a), concurrency=2)

    # committed parts were skipped (never rewritten), missing parts rebuilt
    for p in parts[3:]:
        assert p.stat().st_mtime_ns == untouched[p.name]
    assert sorted(p.name for p in tiles.glob("part-*.parquet")) == [
        f"part-img-{i:03d}.parquet" for i in range(N_FILES)
    ]

    # resumed artifacts == fresh-run artifacts
    assert r2["tiles"] == ref["tiles"] == N_FILES * PER_FILE
    ca = pq.read_table(out_a / "cell_counts.parquet")
    cb = pq.read_table(out_b / "cell_counts.parquet")
    assert ca.equals(cb)
    aa = pq.read_table(out_a / "tile_assignments_base.parquet").sort_by("image_id")
    ab = pq.read_table(out_b / "tile_assignments_base.parquet").sort_by("image_id")
    assert aa.equals(ab)


def test_ingest_manifest_mismatch_rebuilds(ray_session, tmp_path):
    # 9 files so the direct-read path still triggers (≥ 4×concurrency) after one is gone
    imgs = _images_dir(tmp_path, n_files=9)
    out = tmp_path / "out"
    IDX.assign_tiles(imgs, str(out), concurrency=2)

    # the input set changes (one file gone): committed parts are void, not reused
    sorted(Path(imgs).glob("*.parquet"))[-1].unlink()
    r = IDX.assign_tiles(imgs, str(out), concurrency=2)

    tiles = out / "tiles_decoded.parquet"
    assert sorted(p.name for p in tiles.glob("part-*.parquet")) == [
        f"part-img-{i:03d}.parquet" for i in range(8)
    ]
    assert r["tiles"] == 8 * PER_FILE
    n = pq.read_table(out / "tile_assignments_base.parquet").num_rows
    assert n == 8 * PER_FILE
