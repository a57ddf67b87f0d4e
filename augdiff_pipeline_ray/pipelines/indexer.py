"""Indexer job: snapshot → dependency index + partitioned snapshot store + tile assignment.

The reference's first entry point (indexer/src/main/scala/Indexer.scala:14-60): read the
full snapshot, compute the transitive dependency closure (GraphX Pregel there; Ray Data
reachability-doubling joins here, stages/closure.py), persist the index (Postgres there;
sharded Parquet + actor pool here), and write the snapshot sorted/partitioned (ORC-Hive
there; cell→p-partitioned Parquet here).

The graft adds the image side at bootstrap: the hinted image table streams through the
``TileDecoder``/``CellAssigner`` actor pool once, producing the base ``tile_assignments``
(kind="tile", batch_seq=0) used by the per-batch kNN/overlay stages.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..sources import snapshot as SNAP
from ..stages.closure import closure_auto, closure_dataset
from ..stages.edges import edges_from_batch
from ..stages.tiles import TileDecoder, TileDecoderFiles
from ..state.index_store import IndexStore


def run_indexer(
    snapshot_parquet: str,
    out_root: str,
    num_shards: int = 8,
    num_partitions: int | None = None,
) -> dict:
    """snapshot parquet file/dir → out_root/{snapshot_store, index}. Returns stats."""
    t0 = time.perf_counter()
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)

    ds = rd.read_parquet(snapshot_parquet)

    # edges (J1) — vectorized flat-map over Arrow batches
    edges = ds.map_batches(edges_from_batch, batch_format="pyarrow")

    # transitive closure (J2) — size-adaptive: numpy doubling for small edge sets,
    # log-round distributed doubling joins at scale
    clo_table = closure_auto(edges, num_partitions=num_partitions)

    store = IndexStore(str(out / "index"), num_shards=num_shards)
    store.write_full(clo_table)

    # partitioned, sorted snapshot store (S5)
    SNAP.write_snapshot(ds, str(out / "snapshot_store"))

    return {
        "edges": int(len(clo_table)),
        "wall_s": time.perf_counter() - t0,
        "index_root": str(out / "index"),
        "snapshot_store": str(out / "snapshot_store"),
    }


def _collect_pairs(clo: rd.Dataset) -> pa.Table:
    pdf = clo.to_pandas()
    return pa.table({"a": pa.array(pdf["a"].to_numpy(), pa.int64()),
                     "b": pa.array(pdf["b"].to_numpy(), pa.int64())})


def pool_size(frac: float = 0.5, cap: int = 16) -> int:
    """Actor-pool size that leaves CPUs for the read/write stages feeding it — a pool
    reserving every CPU starves the reads and the pipeline deadlocks."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(cap, int(cpus * frac)))


def assign_tiles(
    images_parquet: str,
    out_root: str,
    concurrency: int | None = None,
    batch_size: int = 64,
    verify: bool = True,
) -> dict:
    """Image table → decoded-tile verification + base tile_assignments parquet.

    Actor-pool stage: decode bytes, PIP-assign centroid cell via STRtree, verify pixels
    against the deterministic source (PSNR) — pixels never leave the actor.
    """
    out = Path(out_root)
    out.mkdir(parents=True, exist_ok=True)
    if concurrency is None:
        # decode dominates this stage; the feeding read is I/O-light, so the pool takes
        # most of the node (leaving a slice for the read/collect stages)
        concurrency = pool_size(frac=0.85, cap=64)
    import pyarrow.dataset as pads

    n_imgs = pads.dataset(images_parquet).count_rows()
    bank_rate = max(1, n_imgs // 4096)  # ≤ ~4096 sampled blobs for the overlay bank
    kwargs = {"verify": verify, "bank_rate": bank_rate}
    files = (
        sorted(str(p) for p in Path(images_parquet).glob("*.parquet"))
        if os.path.isdir(images_parquet)
        else []
    )
    if len(files) >= 4 * concurrency:
        # direct-read ingest: actors read their files themselves (no object-store hop
        # for the blob bytes — see TileDecoderFiles)
        ds = rd.from_items([{"path": f} for f in files])
        decoded = ds.map_batches(
            TileDecoderFiles,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=1,
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        ds = rd.read_parquet(images_parquet)
        decoded = ds.map_batches(
            TileDecoder,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    tiles_full = _collect(decoded)
    bank = tiles_full.filter(pc.is_valid(tiles_full["bank_bytes"]))
    pq.write_table(
        bank.select(["image_id", "cell", "w", "h", "fmt", "phash", "bank_bytes"]),
        out / "overlay_bank.parquet",
    )
    tiles = tiles_full.drop_columns(["bank_bytes"])

    # per-cell tile counts (hot-cell stats for lineage/salting). Plan by size: above
    # ~1M tiles the salted skew-splitting shuffle (stages/shuffle.py) does it without a
    # hot reducer; below, the already-collected column counts faster in-process than
    # three shuffle rounds can schedule.
    if len(tiles) > 1_000_000:
        from ..stages.shuffle import salted_group_count

        cell_counts = pa.Table.from_pandas(
            salted_group_count(
                rd.from_arrow(tiles.select(["cell"])), "cell",
                hot_threshold=max(1000, len(tiles) // 50), k=8,
            ).to_pandas(),
            preserve_index=False,
        )
    else:
        import numpy as np

        cells_np = tiles["cell"].to_numpy(zero_copy_only=False)
        u, c = np.unique(cells_np, return_counts=True)
        cell_counts = pa.table({"cell": pa.array(u), "n": pa.array(c.astype("int64"))})
    pq.write_table(cell_counts, out / "cell_counts.parquet")
    assignments = pa.table(
        {
            "batch_seq": pa.array([0] * len(tiles), pa.int64()),
            "image_id": tiles["image_id"],
            "cell": tiles["cell"],
            "key": pa.array([None] * len(tiles), pa.int64()),
            "assignment_kind": pa.array(["tile"] * len(tiles), pa.string()),
        }
    )
    pq.write_table(assignments, out / "tile_assignments_base.parquet")
    pq.write_table(tiles, out / "tiles_decoded.parquet")
    ok = tiles["decode_ok"].to_numpy(zero_copy_only=False)
    return {
        "tiles": len(tiles),
        "decode_ok": int(ok.sum()),
        "assignments": str(out / "tile_assignments_base.parquet"),
        "tiles_decoded": str(out / "tiles_decoded.parquet"),
    }


def _collect(ds: rd.Dataset) -> pa.Table:
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    return pa.concat_tables(batches, promote_options="default")
