"""Streaming augmented-diff job: the reference's second entry point, Ray-Data-native.

Reference driver loop (ad/src/main/scala/AugmentedDiff.scala:166-237 + ChangeAugmenter
:139-163): for each minutely sequence number — fetch+parse OSC; per-batch local closure
against the index (Postgres round-trip); augment semi-join fetch; render features to one
ndjson file; insert new index edges; every 5 batches flush the driver row buffer to ORC.

Rebuild (SURVEY.md §3.4): same loop shape, but every per-batch step is either a Ray
Data/actor fan-out or an idempotent file commit:

1. parse OSC (S6/S7) → Arrow change table
2. local incremental closure (J3/J4): direct edges + 2-hop fetch from the **index actor
   pool** (S11) → fixpoint → (new_edges, all_edges)
3. augment (J5): packed-key semi-join → partition-pruned parallel snapshot fetch +
   memory-tier filter → exact dedup with provenance flag (A3/A4)
4. render: histories + predicates on the (small) context, then geometry build + JSON
   encode fanned out over cells via an actor pool holding the broadcast context (J6) —
   plus per-feature PIP cell assignment, kNN against neighboring tiles, and
   raster↔vector overlay onto affected tiles
5. sinks: ndjson (atomic), tile_assignments + knn + overlay parquet (idempotent by
   batch_seq), memory-tier parquet, index append — then the **lineage commit** that
   marks the batch done (state/lineage.py)
6. every ``save_interval`` (=5, parity with the reference's saveInterval) batches, the
   memory tier flushes into the partitioned snapshot store

A killed run restarted with the same roots skips committed batches (lineage) and
recomputes nothing — outputs are byte-identical (tested).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..sources import geojson as GJ
from ..sources import osc as OSC
from ..sources import snapshot as SNAP
from ..stages import tiles as T
from ..stages.augment import augment_rows
from ..stages.closure import local_closure
from ..stages.edges import edges_from_rows_local
from ..stages.render import RenderContext, rows_from_arrow
from ..state.index_store import IndexStore
from ..state.lineage import Lineage
from ..state.tile_pool import TilePool
from . import indexer as IDX

SAVE_INTERVAL = 5  # parity: AugmentedDiff.scala:216


def render_entities(
    ctx: RenderContext, assigner, orders, types, ids
) -> pa.Table:
    """Geometry build + JSON encode + PIP cell assignment for a chunk of entities —
    shared by the local path and the persistent render actor pool."""
    out_order, out_json, out_key = [], [], []
    rep_lon, rep_lat = [], []
    for order, tipe, id_ in zip(orders, types, ids):
        feats = ctx.features_for(tipe, id_)
        key = (id_ << 2) | {"node": 0, "way": 1, "relation": 2}[tipe]
        for j, f in enumerate(feats):
            rep = _rep_point(f["geometry"])
            rep_lon.append(np.nan if rep is None else rep[0])
            rep_lat.append(np.nan if rep is None else rep[1])
            out_order.append(order * 4 + j)
            out_json.append(json.dumps(f, separators=(",", ":")))
            out_key.append(key)
    # one vectorized PIP assignment for the whole chunk (NaN rep → cell -1)
    rlon = np.asarray(rep_lon, float)
    rlat = np.asarray(rep_lat, float)
    cells = assigner.assign_points(rlat, rlon)
    return pa.table(
        {
            "order": pa.array(out_order, pa.int64()),
            "feature": pa.array(out_json, pa.string()),
            "key": pa.array(out_key, pa.int64()),
            "cell": pa.array(cells, pa.int64()),
            "rep_lon": pa.array(rlon, pa.float64()),
            "rep_lat": pa.array(rlat, pa.float64()),
        }
    )


@ray.remote(num_cpus=1)
class RenderShard:
    """Persistent render actor: lives across micro-batches (the per-batch actor-pool
    spin-up was the dominant stream cost). Per batch, the broadcast row list arrives
    once (ObjectRef auto-deref) and the context is rebuilt only when ``seq`` advances."""

    def __init__(self):
        self._seq = None
        self._ctx: RenderContext | None = None
        self.assigner = T.CellAssigner()

    def render(self, seq: int, rows: list, orders, types, ids) -> pa.Table:
        if self._seq != seq:
            self._ctx = RenderContext(rows)
            self._seq = seq
        return render_entities(self._ctx, self.assigner, orders, types, ids)


def _rep_point(geom_json: dict) -> tuple[float, float] | None:
    """GeoJSON dict → (lon, lat) representative point."""
    t = geom_json["type"]
    if t == "GeometryCollection":
        for g in geom_json["geometries"]:
            p = _rep_point(g)
            if p is not None:
                return p
        return None
    c = geom_json["coordinates"]
    if t == "Point":
        return c[0], c[1]
    if t == "LineString":
        arr = np.asarray(c, float)
    elif t == "Polygon":
        arr = np.asarray(c[0][:-1], float)
    elif t == "MultiLineString":
        arr = np.vstack([np.asarray(l, float) for l in c])
    elif t == "MultiPolygon":
        arr = np.asarray(c[0][0][:-1], float)
    else:
        return None
    if len(arr) == 0:
        return None
    m = arr.mean(axis=0)
    return float(m[0]), float(m[1])


class AdiffJob:
    """Driver-side handle for one stream run over a world (resumable)."""

    def __init__(
        self,
        world_root: str,
        out_root: str,
        num_shards: int = 4,
        render_concurrency: int | None = None,
        save_interval: int = SAVE_INTERVAL,
        drop_tags_on_load: bool = True,
        knn_k: int = 3,
        max_overlay_tiles_per_batch: int = 8,
        parallel_fetch: bool | str = "auto",
        distributed_render: bool = True,
    ):
        self.world = Path(world_root)
        self.out = Path(out_root)
        self.out.mkdir(parents=True, exist_ok=True)
        self.num_shards = num_shards
        if render_concurrency is None:
            from .indexer import pool_size

            render_concurrency = max(2, pool_size(frac=0.25, cap=16))
        self.render_concurrency = render_concurrency
        self.save_interval = save_interval
        self.drop_tags_on_load = drop_tags_on_load
        self.knn_k = knn_k
        self.max_overlay = max_overlay_tiles_per_batch
        self.parallel_fetch = parallel_fetch
        self.distributed_render = distributed_render

        self.snapshot_store = str(self.out / "snapshot_store")
        self.index_root = str(self.out / "index")
        self.memory_root = self.out / "memory"
        self.adiff_template = str(self.out / "adiff" / "AAA" / "BBB" / "CCC.ndjson")
        self.lineage = Lineage(str(self.out / "lineage"))
        self.store: IndexStore | None = None
        self._tiles: TilePool | None = None

    # -- bootstrap -----------------------------------------------------------

    def bootstrap(self) -> dict:
        """Index + snapshot store + base tile assignments (idempotent: skipped when the
        lineage marks batch 0 committed)."""
        stats = {}
        if not self.lineage.is_committed(0):
            stats["indexer"] = IDX.run_indexer(
                str(self.world / "snapshot.parquet"), str(self.out),
                num_shards=self.num_shards,
            )
            stats["tiles"] = IDX.assign_tiles(
                str(self.world / "images.parquet"), str(self.out)
            )
            self.lineage.commit(0, [
                {"batch_seq": 0, "cell": -1,
                 "rows_in": int(stats["tiles"]["tiles"]),
                 "rows_out": int(stats["indexer"]["edges"]),
                 "bytes": 0, "wall_ms": stats["indexer"]["wall_s"] * 1000.0,
                 "status": "committed"}
            ])
        return stats

    def _tile_pool(self) -> TilePool:
        """Cell-sharded tile index + overlay bank actor pool (persistent across batches):
        each shard holds only its cells' centroid rows and bank blobs — the driver never
        materializes the tile table (VERDICT r1 #3)."""
        if self._tiles is None:
            self._tiles = TilePool(
                str(self.out / "tiles_decoded.parquet"),
                str(self.out / "overlay_bank.parquet"),
                num_shards=max(2, self.render_concurrency),
            )
        return self._tiles

    # -- one micro-batch (head → async tail → finish) ------------------------
    #
    # The batch splits into a HEAD (parse → closure → augment → render → emit +
    # durable per-batch state: assignments, memory tier, index append) and a TAIL
    # (kNN + overlay scatter-gathers over the tile pool). The tail runs as actor
    # futures, so ``run_stream`` overlaps batch k's tail with batch k+1's head —
    # the r1 driver-serial Amdahl term becomes pipelined work. The lineage commit
    # for k happens only in ``_finish_batch`` after k's tail is durable; a kill in
    # between recomputes k (idempotent writes → byte-identical, tested).

    def _run_head(self, seq: int) -> dict:
        t0 = time.perf_counter()
        stage_t: dict[str, float] = {}

        def _mark(name, t_start):
            stage_t[name] = round(time.perf_counter() - t_start, 3)
            return time.perf_counter()

        ts = time.perf_counter()
        osc_path = str(self.world / "changes" / OSC.sequence_path(seq)) + ".osc"
        update = OSC.read_osc_file(osc_path, batch_seq=seq)
        update_el = update.drop_columns(["batch_seq", "action"])
        ts = _mark("parse", ts)

        # J3/J4: local closure against the shared index (actor pool 2-hop fetch, S11)
        row_edges = edges_from_rows_local(update_el)
        touched = {b for _, b in row_edges}
        existing = self.store.load_edges(touched)
        new_edges, all_edges = local_closure(row_edges, existing)
        ts = _mark("closure", ts)

        # J5: semi-join fetch from memory + storage tiers
        memory = self._read_memory()
        rows = augment_rows(
            update_el, memory, all_edges, self.snapshot_store,
            drop_tags_on_load=self.drop_tags_on_load,
            parallel_fetch=self.parallel_fetch,
        )
        ts = _mark("augment", ts)

        # render (distributed by entity over the broadcast context)
        ctx = RenderContext(rows)
        ents = ctx.entity_list()
        # adaptive: below ~3k entities the actor-pool spin-up costs more than the
        # geometry work; render in-process (distributed_render=False forces local,
        # True forces the pool for tests)
        use_pool = (
            self.distributed_render
            and len(ents) >= (0 if self.distributed_render == "force" else 3000)
        )
        if use_pool and len(ents) > 0:
            feat_tbl = self._render_distributed(ctx, ents, seq)
        else:
            feat_tbl = self._render_local(ctx, ents)

        ts = _mark("render", ts)
        order = np.argsort(feat_tbl["order"].to_numpy(zero_copy_only=False), kind="stable")
        feats_py = feat_tbl["feature"].to_pylist()
        lines = [feats_py[i] for i in order]
        json_path = GJ.batch_json_path(self.adiff_template, seq)
        nbytes = GJ.write_features(json_path, lines)

        keys_np = feat_tbl["key"].to_numpy(zero_copy_only=False)[order]
        cells_np = feat_tbl["cell"].to_numpy(zero_copy_only=False)[order]
        self._write_assignments(seq, keys_np, cells_np)

        # memory tier append (T2 analogue, durable per batch)
        self._write_memory(seq, update_el)
        # index incremental append (S10) — must land before the NEXT batch's closure
        self.store.append_batch(new_edges, seq)
        # flush every save_interval batches (reference parity)
        if seq % self.save_interval == 0:
            self._flush_memory(seq)
        ts = _mark("emit", ts)

        return {
            "seq": seq, "t0": t0, "stage_t": stage_t,
            "feat_tbl": feat_tbl, "order": order, "lines": lines,
            "keys_np": keys_np, "cells_np": cells_np, "nbytes": nbytes,
            "update_el": update_el, "n_aug": len(rows), "n_new_edges": len(new_edges),
        }

    def _launch_tail(self, head: dict) -> dict:
        """Scatter the kNN + overlay phase-1 calls; return the in-flight futures."""
        feat_tbl, order = head["feat_tbl"], head["order"]
        tail: dict = {"knn_futs": None, "keep": None, "sel_futs": None}
        if len(feat_tbl):
            rlat = feat_tbl["rep_lat"].to_numpy(zero_copy_only=False)[order]
            rlon = feat_tbl["rep_lon"].to_numpy(zero_copy_only=False)[order]
            keep = np.nonzero(~(np.isnan(rlat) | np.isnan(rlon)))[0]
            if len(keep):
                tail["knn_futs"] = self._tile_pool().knn_scatter(
                    rlat[keep], rlon[keep], self.knn_k
                )
                tail["keep"] = keep
        touched = np.unique(np.asarray(head["cells_np"], np.int64))
        touched = touched[touched >= 0]
        if len(touched):
            tail["sel_futs"] = self._tile_pool().overlay_select_scatter(touched)
        return tail

    def _finish_batch(self, head: dict, tail: dict) -> dict:
        seq = head["seq"]
        stage_t = head["stage_t"]
        ts = time.perf_counter()

        # kNN gather + merge + idempotent write
        knn_rows = 0
        if tail["knn_futs"] is not None:
            keep = tail["keep"]
            parts = ray.get(tail["knn_futs"])
            knn = TilePool.knn_merge(parts, len(keep), self.knn_k)
            lens = np.fromiter((len(n) for n in knn), np.int64, len(knn))
            q_idx = np.repeat(keep, lens)
            t = pa.table(
                {
                    "batch_seq": pa.array(np.full(len(q_idx), seq, np.int64)),
                    "key": pa.array(head["keys_np"][q_idx], pa.int64()),
                    "rank": pa.array(
                        np.concatenate([np.arange(l, dtype=np.int64) for l in lens])
                        if len(lens) else np.empty(0, np.int64)
                    ),
                    "image_id": pa.array([iid for n in knn for iid, _ in n], pa.string()),
                    "dist_m": pa.array([d for n in knn for _, d in n], pa.float64()),
                }
            )
            self._write_knn(seq, t)
            knn_rows = len(t)
        else:
            self._write_knn(seq, None)
        ts2 = time.perf_counter()
        stage_t["knn"] = round(ts2 - ts, 3)

        # overlay phase 2 + idempotent write
        if tail["sel_futs"] is not None:
            sels = ray.get(tail["sel_futs"])
            rows = self._tile_pool().overlay_finish(
                seq, sels, head["lines"], self.max_overlay
            )
        else:
            rows = []
        self._write_overlay(seq, rows)
        stage_t["overlay"] = round(time.perf_counter() - ts2, 3)

        # lineage commit — marks the batch done
        wall_ms = (time.perf_counter() - head["t0"]) * 1000.0
        cell_rows = self._lineage_rows(
            seq, head["update_el"], head["cells_np"], head["nbytes"], wall_ms
        )
        self.lineage.commit(seq, cell_rows)
        return {
            "seq": seq,
            "update_rows": len(head["update_el"]),
            "aug_rows": head["n_aug"],
            "features": len(head["lines"]),
            "new_edges": head["n_new_edges"],
            "knn": knn_rows,
            "overlay": len(rows),
            "wall_ms": wall_ms,
            "stage_sec": stage_t,
        }

    def run_batch(self, seq: int) -> dict:
        head = self._run_head(seq)
        return self._finish_batch(head, self._launch_tail(head))

    # -- render paths --------------------------------------------------------

    def _render_pool(self) -> list:
        if getattr(self, "_pool_actors", None) is None:
            self._pool_actors = [RenderShard.remote() for _ in range(self.render_concurrency)]
        return self._pool_actors

    def _render_distributed(self, ctx: RenderContext, ents, seq: int) -> pa.Table:
        """Persistent actor pool: broadcast the (small) row list once, split the entity
        work-list across the pool; each actor rebuilds its context only when seq moves."""
        pool = self._render_pool()
        rows_ref = ray.put(ctx.rows)
        orders = list(range(len(ents)))
        types = [e[0] for e in ents]
        ids = [e[1] for e in ents]
        n = len(pool)
        futs = []
        for i in range(n):
            sl = slice(i, None, n)  # strided split: balances heavy relations
            futs.append(pool[i].render.remote(seq, rows_ref, orders[sl], types[sl], ids[sl]))
        parts = ray.get(futs)
        return pa.concat_tables(parts, promote_options="default")

    def _render_local(self, ctx: RenderContext, ents) -> pa.Table:
        return render_entities(
            ctx, T.CellAssigner(),
            list(range(len(ents))), [e[0] for e in ents], [e[1] for e in ents],
        )

    # -- memory tier ---------------------------------------------------------

    def _read_memory(self) -> pa.Table:
        files = sorted(self.memory_root.glob("batch-*.parquet")) if self.memory_root.exists() else []
        if not files:
            return None
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")

    def _write_memory(self, seq: int, table: pa.Table) -> None:
        self.memory_root.mkdir(parents=True, exist_ok=True)
        tmp = self.memory_root / f"batch-{seq:09d}.tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.memory_root / f"batch-{seq:09d}.parquet")

    def _flush_memory(self, seq: int) -> None:
        """Append memory files into the partitioned snapshot store, then clear them
        (reference flush, AugmentedDiff.scala:226-233 — idempotent by batch name)."""
        for f in sorted(self.memory_root.glob("batch-*.parquet")):
            bseq = int(f.stem.split("-")[1])
            SNAP.append_rows(pq.read_table(f), self.snapshot_store, bseq)
            f.unlink()
        SNAP.invalidate_pads_cache(self.snapshot_store)

    # -- graft outputs -------------------------------------------------------

    def _write_assignments(self, seq: int, keys_np, cells_np) -> None:
        t = pa.table(
            {
                "batch_seq": pa.array([seq] * len(keys_np), pa.int64()),
                "image_id": pa.array([None] * len(keys_np), pa.string()),
                "cell": pa.array(cells_np, pa.int64()),
                "key": pa.array(keys_np, pa.int64()),
                "assignment_kind": pa.array(["geometry"] * len(keys_np), pa.string()),
            }
        )
        d = self.out / "assignments"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f"batch-{seq:09d}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, d / f"batch-{seq:09d}.parquet")

    def _write_knn(self, seq: int, t: pa.Table | None) -> None:
        if t is None:
            t = pa.table(
                {"batch_seq": pa.array([], pa.int64()), "key": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64()), "image_id": pa.array([], pa.string()),
                 "dist_m": pa.array([], pa.float64())})
        d = self.out / "knn"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f"batch-{seq:09d}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, d / f"batch-{seq:09d}.parquet")

    def _write_overlay(self, seq: int, rows: list[dict]) -> None:
        d = self.out / "overlay"
        d.mkdir(parents=True, exist_ok=True)
        t = pa.Table.from_pylist(rows) if rows else pa.table(
            {"batch_seq": pa.array([], pa.int64()), "image_id": pa.array([], pa.string()),
             "changed_px": pa.array([], pa.int64()), "w": pa.array([], pa.int32()),
             "h": pa.array([], pa.int32())})
        tmp = d / f"batch-{seq:09d}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, d / f"batch-{seq:09d}.parquet")

    def _lineage_rows(self, seq, update_el, cells_np, nbytes, wall_ms) -> list[dict]:
        cells_in = update_el["cell"].to_numpy(zero_copy_only=False) if len(update_el) else np.empty(0, np.int64)
        all_cells = set(int(c) for c in cells_in) | set(int(c) for c in cells_np)
        rows = []
        for c in sorted(all_cells):
            rows.append(
                {"batch_seq": seq, "cell": int(c),
                 "rows_in": int((cells_in == c).sum()),
                 "rows_out": int((cells_np == c).sum()),
                 "bytes": int(nbytes), "wall_ms": float(wall_ms),
                 "status": "committed"}
            )
        return rows

    # -- stream --------------------------------------------------------------

    def run_stream(self, start: int = 1, end: int | None = None) -> dict:
        """Run batches [start, end]; committed batches are skipped (resume)."""
        if end is None:
            # infer from world: count osc files
            osc_files = sorted((self.world / "changes").rglob("*.osc"))
            end = len(osc_files)
        self.bootstrap()
        self._tile_pool()  # pre-spawn: shard loads overlap the first batch's head
        if self.store is None:
            self.store = IndexStore(self.index_root, num_shards=self.num_shards)
            self.store.start_pool()
        done = self.lineage.completed()
        stats = []
        # software-pipelined loop: batch k's tail (kNN/overlay scatter-gather futures)
        # runs while batch k+1's head executes on the driver. Correctness: k+1's
        # closure/augment read only the index + memory tier, which k's HEAD already
        # committed; k's lineage commit stays ordered after k's tail is durable.
        pending: tuple[dict, dict] | None = None
        for seq in range(start, end + 1):
            if seq in done:
                continue
            head = self._run_head(seq)
            tail = self._launch_tail(head)
            if pending is not None:
                stats.append(self._finish_batch(*pending))
            pending = (head, tail)
        if pending is not None:
            stats.append(self._finish_batch(*pending))
        return {"batches": stats, "skipped": sorted(done - {0}), "end": end}

    def close(self) -> None:
        if self.store is not None:
            self.store.stop_pool()
            self.store = None
        if getattr(self, "_pool_actors", None):
            for a in self._pool_actors:
                ray.kill(a)
            self._pool_actors = None
        if self._tiles is not None:
            self._tiles.close()
            self._tiles = None


def run_stream(world_root: str, out_root: str, **kwargs) -> dict:
    """Convenience one-shot: bootstrap + full stream + close."""
    job = AdiffJob(world_root, out_root, **kwargs)
    try:
        return job.run_stream()
    finally:
        job.close()
