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
import threading
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .. import cells as C
from .. import keys as K
from ..functions import geom as G
from ..sources import geojson as GJ
from ..sources import osc as OSC
from ..sources import snapshot as SNAP
from ..stages import tiles as T
from ..stages.augment import augment_parts, augment_table, row_hashes, table_meta
from ..stages.closure import local_closure_np
from ..stages.edges import edges_from_rows_np
from ..heap import retain_heap
from ..stages.render import ColumnarRenderContext
from ..state.index_store import IndexStore
from ..state.lineage import Lineage
from ..state.tile_pool import TilePool
from . import indexer as IDX

SAVE_INTERVAL = 5  # parity: AugmentedDiff.scala:216


def render_entities(
    ctx: ColumnarRenderContext, assigner, orders, types, ids
) -> tuple[pa.Table, pa.Table]:
    """Geometry build + JSON encode + PIP cell assignment for a chunk of entities —
    shared by the local path and the persistent render actor pool.

    Returns TWO tables so the driver never touches the heavy columns:

    * ``meta`` (order, key, cell, rep_lon, rep_lat) — a few int64/float64 per
      feature; the driver gathers + concatenates these for kNN routing, overlay cell
      selection, assignment/lineage writes.
    * ``payload`` (order, feature JSON, wkb, bbox) — the big string/binary columns;
      stays in the object store as one ref per render shard, consumed (concat +
      order-sort) inside the off-driver tail tasks. The r2 path concatenated the
      payload on the driver and re-``ray.put`` it per batch — a driver-serial
      copy proportional to batch size, i.e. an Amdahl term the pool could not
      shrink."""
    orders_np = np.asarray(orders, np.int64)
    ids_np = np.asarray(ids, np.int64)
    tarr = np.asarray(types, object)
    node_m = tarr == "node"

    # NODE FAST PATH (~90% of stream entities): vectorized emission plan +
    # byte-identical JSON from the columnar context; Point wkb/bbox/rep are
    # closed-form arrays — no per-entity dict/geometry objects at all
    ent_pos, jj, rowi, forceinv = ctx.node_emissions(ids_np[node_m])
    fast_json = ctx.node_feature_json(rowi, forceinv)
    n_orders = orders_np[node_m]
    fast_order = n_orders[ent_pos] * 4 + jj
    fast_key = ids_np[node_m][ent_pos] << 2  # | NODE code 0
    f_lon = np.ascontiguousarray(ctx.lon[rowi], "<f8")
    f_lat = np.ascontiguousarray(ctx.lat[rowi], "<f8")
    nw = len(rowi)
    wkb_buf = np.zeros((nw, 21), np.uint8)
    wkb_buf[:, 0] = 1  # little-endian
    wkb_buf[:, 1] = 1  # WKB_POINT
    if nw:
        wkb_buf[:, 5:13] = f_lon.view(np.uint8).reshape(nw, 8)
        wkb_buf[:, 13:21] = f_lat.view(np.uint8).reshape(nw, 8)
    fast_wkb = [b.tobytes() for b in wkb_buf]
    fast_bb = np.stack([f_lon, f_lat, f_lon, f_lat], axis=1) if nw else np.empty((0, 4))

    out_order, out_json, out_key = [], [], []
    rep_lon, rep_lat = [], []
    out_wkb, out_bb = [], []
    slow = np.flatnonzero(~node_m)
    for order, tipe, id_ in zip(
        orders_np[slow].tolist(), tarr[slow].tolist(), ids_np[slow].tolist()
    ):
        feats = ctx.features_for(tipe, id_)
        key = (id_ << 2) | {"node": 0, "way": 1, "relation": 2}[tipe]
        for j, f in enumerate(feats):
            rep = _rep_point(f["geometry"])
            rep_lon.append(np.nan if rep is None else rep[0])
            rep_lat.append(np.nan if rep is None else rep[1])
            out_order.append(order * 4 + j)
            out_json.append(json.dumps(f, separators=(",", ":")))
            out_key.append(key)
            # compact geometry for the overlay tail: WKB + bbox, built HERE in the
            # distributed render — downstream never re-parses the feature JSON
            g = G.geojson_to_geom(f["geometry"])
            out_wkb.append(G.geom_to_wkb(g) if g is not None else None)
            bb = G.geom_bbox(g) if g is not None else None
            out_bb.append(
                (np.nan, np.nan, np.nan, np.nan) if bb is None else tuple(float(v) for v in bb)
            )
    # one vectorized PIP assignment for the whole chunk (NaN rep → cell -1)
    rlon = np.concatenate([f_lon, np.asarray(rep_lon, float)])
    rlat = np.concatenate([f_lat, np.asarray(rep_lat, float)])
    cells = assigner.assign_points(rlat, rlon)
    bb_flat = np.concatenate(
        [fast_bb.reshape(-1), np.asarray(out_bb, np.float64).reshape(-1)]
    )
    out_order = np.concatenate([fast_order, np.asarray(out_order, np.int64)])
    out_key = np.concatenate([fast_key, np.asarray(out_key, np.int64)])
    out_json = fast_json + out_json
    out_wkb = fast_wkb + out_wkb
    order_arr = pa.array(out_order, pa.int64())
    meta = pa.table(
        {
            "order": order_arr,
            "key": pa.array(out_key, pa.int64()),
            "cell": pa.array(cells, pa.int64()),
            "rep_lon": pa.array(rlon, pa.float64()),
            "rep_lat": pa.array(rlat, pa.float64()),
        }
    )
    payload = pa.table(
        {
            "order": order_arr,
            "feature": pa.array(out_json, pa.string()),
            "wkb": pa.array(out_wkb, pa.binary()),
            "bbox": pa.FixedSizeListArray.from_arrays(pa.array(bb_flat, pa.float64()), 4),
        }
    )
    return meta, payload


@ray.remote(num_cpus=1, max_restarts=2, max_task_retries=2)
class RenderShard:
    """Persistent render actor: lives across micro-batches (the per-batch actor-pool
    spin-up was the dominant stream cost). Per batch, the broadcast row table arrives
    once (ObjectRef auto-deref) and the shard builds a columnar context over its
    subset — numpy segment kernels, no per-row Python (VERDICT r2 #1).

    Restartable (max_restarts/max_task_retries): the constructor takes no arguments
    (so a restart can never lose them — the core-worker caveat for object-store ctor
    args doesn't apply) and ``render_part_idx`` is a deterministic pure function of
    its inputs with per-``seq`` context rebuild, so a replayed call after an actor
    death (OOM kill, node loss) returns byte-identical output instead of aborting
    the batch. A batch that still fails after retries aborts cleanly and the lineage
    resume protocol recomputes it (tested both ways)."""

    def __init__(self):
        retain_heap()  # per-batch ctx scratch is steady-state; keep it OS-resident
        self.assigner = T.CellAssigner()

    def ping(self) -> bool:
        """Startup barrier: returns once the actor process is live with imports done."""
        return True

    @ray.method(num_returns=2)
    def render_part_idx(self, seq: int, big: pa.Table, idx: np.ndarray,
                        flags: np.ndarray, orders, types, ids
                        ) -> tuple[pa.Table, pa.Table]:
        """Index-addressed variant: the batch's undeduped row table arrives ONCE per
        actor as a broadcast ObjectRef (zero-copy Arrow); the shard takes its subset
        here, off the driver, and passes the per-row ``in_update`` provenance
        straight to the columnar context (no appended column, no copy)."""
        t0 = time.perf_counter()
        ctx = ColumnarRenderContext(big.take(pa.array(idx)), in_update=flags)
        t1 = time.perf_counter()
        out = render_entities(ctx, self.assigner, orders, types, ids)
        if os.environ.get("AUGDIFF_RENDER_DEBUG"):
            print(f"[rshard] rows={len(idx)} ents={len(ids)} ctx={t1-t0:.3f} "
                  f"render={time.perf_counter()-t1:.3f}", flush=True)
        return out

    @ray.method(num_returns=2)
    def render_part(self, seq: int, tbl: pa.Table, orders, types, ids
                    ) -> tuple[pa.Table, pa.Table]:
        """Dependency-partitioned variant: the shard's row SUBSET arrives as Arrow
        (with its ``in_update`` column); the columnar context builds here, on the
        actor, over O(rows/N) — numpy segment kernels, no per-row dict conversion
        (the r2 dict path + its cross-batch row cache are gone, VERDICT r2 #1)."""
        t0 = time.perf_counter()
        ctx = ColumnarRenderContext(tbl)
        t1 = time.perf_counter()
        out = render_entities(ctx, self.assigner, orders, types, ids)
        if os.environ.get("AUGDIFF_RENDER_DEBUG"):
            print(f"[rshard] rows={len(tbl)} ents={len(ids)} ctx={t1-t0:.3f} "
                  f"render={time.perf_counter()-t1:.3f}", flush=True)
        return out


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


@ray.remote(num_cpus=0)
def _parse_osc_task(path: str, seq: int) -> pa.Table:
    # returns the change-element table directly (batch_seq/action dropped): the same
    # object-store ref then serves the driver's closure read, the off-driver augment
    # stage AND the memory-tier segment — one parse, zero re-puts
    return OSC.read_osc_file(path, batch_seq=seq).drop_columns(["batch_seq", "action"])


class AugmentShard:
    """Off-driver augment stage (J5): semi-join fetch + dedup + render scatter for one
    batch per call, pipelined across batches by ``run_stream``.

    Augment has NO cross-batch dependency of its own — batch k's call reads only the
    immutable tier-segment refs (≤ k-1), the snapshot store, and batch k's update —
    so with P shards up to P batches' augments run concurrently while the driver's
    serial chain shrinks to parse-get + closure + state appends (the r2 stream's
    Amdahl term was this augment work running driver-serial between batches).

    State is a pure cache: per-segment (table, hashes, meta) keyed by seq (dropped on
    flush adopt), plus the process-local snapshot hot-cache (warmed in ``__init__``,
    folded forward on ``adopt_flush`` — the same ``merged_cache`` protocol as the
    driver). A restarted actor rebuilds both from disk/refs, and a replayed call
    returns identical results (the mid-flush delta-on-disk state dedups to
    byte-identical output exactly as the tested crash/resume path does)."""

    def __init__(self, snapshot_root: str, drop_tags_on_load: bool,
                 parallel_fetch, node_latest_only: bool, distributed_render,
                 render_actors: list):
        retain_heap()
        self.root = snapshot_root
        self.drop_tags = drop_tags_on_load
        self.parallel_fetch = parallel_fetch
        self.node_latest_only = node_latest_only
        self.distributed_render = distributed_render
        self.render_actors = render_actors or []
        SNAP.warm_cache(snapshot_root)
        self._seg: dict[int, tuple] = {}

    def ping(self) -> bool:
        return True

    def adopt_flush(self, rows: pa.Table, flushed_seqs: list[int]) -> bool:
        """Fold a flushed tier into this process's snapshot hot-cache and drop the
        flushed segments. Submitted by the driver BEFORE any post-adopt augment call
        on this actor — per-caller actor ordering makes the boundary deterministic."""
        SNAP.adopt_cache(self.root, SNAP.merged_cache(self.root, rows))
        for s in flushed_seqs:
            self._seg.pop(s, None)
        return True

    def augment_scatter(self, seq: int, update: pa.Table,
                        tier: list, all_a: np.ndarray, all_b: np.ndarray) -> dict:
        """One batch: augment_parts over (update, tier segments, snapshot store),
        then either the render-pool scatter (returns the per-shard meta/payload
        futures for the collector) or the local render (small batches)."""
        t0 = time.perf_counter()
        stage_t: dict[str, float] = {}
        missing = [(s, ref) for s, ref in tier if s not in self._seg]
        if missing:
            tbls = ray.get([r for _, r in missing])
            for (s, _), t in zip(missing, tbls):
                self._seg[s] = (t, row_hashes(t), table_meta(t))
        segs = [self._seg[s] for s, _ in tier]
        memory = (pa.concat_tables([e[0] for e in segs], promote_options="default")
                  if segs else None)
        mh = ((np.concatenate([e[1][0] for e in segs]),
               np.concatenate([e[1][1] for e in segs])) if segs else None)
        mm = (tuple(np.concatenate([e[2][i] for e in segs]) for i in range(3))
              if segs else None)
        upd_hashes = row_hashes(update)
        big, rep, flag, order = augment_parts(
            update, memory, (all_a, all_b), self.root,
            drop_tags_on_load=self.drop_tags,
            parallel_fetch=self.parallel_fetch,
            memory_hashes=mh, update_hashes=upd_hashes, memory_meta=mm,
            node_latest_only=self.node_latest_only,
        )
        self._seg[seq] = (update, upd_hashes, table_meta(update))
        aug_sel = rep[order]
        aug_flag_sorted = flag[order]
        row_keys = K.pack_typed(big["id"], big["type"])[aug_sel]
        ents_sorted = np.unique(row_keys)
        ents_sorted = ents_sorted[np.lexsort((ents_sorted >> 2, ents_sorted & 3))]
        stage_t["augment"] = round(time.perf_counter() - t0, 3)
        ts = time.perf_counter()
        use_pool = (
            bool(self.render_actors) and self.distributed_render
            and len(ents_sorted)
            >= (0 if self.distributed_render == "force" else 3000)
        )
        if use_pool and len(ents_sorted) > 0:
            meta_futs, payload_refs = render_partition_scatter(
                self.render_actors, big, aug_sel, aug_flag_sorted, row_keys,
                ents_sorted, (all_a, all_b), seq,
            )
            meta = None
        else:
            ents = [(K.TYPE_NAMES[int(k) & 3], int(k) >> 2) for k in ents_sorted]
            aug_tbl = big.combine_chunks().take(pa.array(aug_sel))
            ctx = ColumnarRenderContext(aug_tbl, in_update=aug_flag_sorted)
            meta, payload = render_entities(
                ctx, T.CellAssigner(),
                list(range(len(ents))), [e[0] for e in ents], [e[1] for e in ents],
            )
            meta_futs = None
            payload_refs = [ray.put(payload)] if len(payload) else []
        stage_t["r_scatter"] = round(time.perf_counter() - ts, 3)
        return {"meta_futs": meta_futs, "meta": meta, "payload_refs": payload_refs,
                "n_aug": len(aug_sel), "stage_t": stage_t}


@ray.remote(num_cpus=0)
def _warm_worker() -> bool:
    """Startup no-op: holding the worker ~0.2 s forces the concurrent warm calls onto
    DISTINCT worker processes, each paying its package import now, not in batch 1."""
    time.sleep(0.2)
    return True


def _atomic_pq_write(d: str, seq: int, t: pa.Table) -> None:
    """Idempotent per-sequence parquet commit. Filesystem paths (plain or ``file://``)
    use tmp+rename; object-store URIs (s3/gs) write the final name directly — an
    incomplete PUT never becomes visible, so stream completion IS the commit; rename-
    capable remote filesystems (hdfs) write a dot-tmp then ``fs.move`` so a mid-write
    crash never leaves a partial file at the committed name (the resume protocol
    treats present batch files as durable truth). Schemes per the reference's Hadoop
    FS sink layer, ChangeAugmenter.scala:151-157.

    NB: ``GJ`` must stay a module-level import — this function runs inside remote
    tail tasks, where the by-value-pickled package is not importable by name."""
    from urllib.parse import urlparse

    scheme = urlparse(str(d)).scheme
    if scheme == "file":
        d = urlparse(str(d)).path  # visible==committed needs the local tmp+rename
    elif scheme in ("s3", "gs", "hdfs"):
        import posixpath

        fs, p = GJ._uri_fs(d)
        fs.create_dir(p, recursive=True)
        final = posixpath.join(p, f"batch-{seq:09d}.parquet")
        if scheme == "hdfs":
            tmp = posixpath.join(p, f".batch-{seq:09d}.tmp")
            with fs.open_output_stream(tmp) as f:
                pq.write_table(t, f)
            fs.move(tmp, final)
        else:
            with fs.open_output_stream(final) as f:
                pq.write_table(t, f)
        return
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".batch-{seq:09d}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(d, f"batch-{seq:09d}.parquet"))
    # self-heal: a crashed writer may have left a non-dot tmp (scan-poisoning) from
    # an interrupted batch — recomputing the batch removes it
    stray = os.path.join(d, f"batch-{seq:09d}.tmp")
    if os.path.exists(stray):
        os.remove(stray)


def _write_assignments_file(d: str, seq: int, keys_np, cells_np) -> None:
    n = len(keys_np)
    kind = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, np.int32)), pa.array(["geometry"])
    ).cast(pa.string())
    _atomic_pq_write(d, seq, pa.table(
        {
            "batch_seq": pa.array(np.full(n, seq, np.int64)),
            "image_id": pa.nulls(n, pa.string()),
            "cell": pa.array(np.asarray(cells_np, np.int64)),
            "key": pa.array(np.asarray(keys_np, np.int64)),
            "assignment_kind": kind,
        }
    ))


def _write_knn_file(d: str, seq: int, t: pa.Table | None) -> None:
    if t is None:
        t = pa.table(
            {"batch_seq": pa.array([], pa.int64()), "key": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "image_id": pa.array([], pa.string()),
             "dist_m": pa.array([], pa.float64())})
    _atomic_pq_write(d, seq, t)


def _write_overlay_file(d: str, seq: int, rows: list[dict]) -> None:
    t = pa.Table.from_pylist(rows) if rows else pa.table(
        {"batch_seq": pa.array([], pa.int64()), "image_id": pa.array([], pa.string()),
         "changed_px": pa.array([], pa.int64()), "w": pa.array([], pa.int32()),
         "h": pa.array([], pa.int32())})
    _atomic_pq_write(d, seq, t)


# The batch tail runs OFF the driver as three INDEPENDENT tasks (feature-JSON emit,
# kNN escalation rounds, overlay phase-2 rasterize), so the pipeline's rate limit is
# the slowest single component, not their sum. ``pool`` is the (small) TilePool handle
# bundle: routing bounds + shard actor handles. All writes are idempotent (tmp+rename)
# and the batch's lineage commit happens only after every tail task returns.
#
# The pool handle travels as an OBJECT REF + a worker-local cache: unpickling its
# ~2×pool-width actor handles cost ~10 ms per task × 3 tail tasks × every batch
# (measured in the ray timeline as deserialize_arguments), and warm task workers
# are reused across batches, so each worker deserializes the pool exactly once.

_POOL_CACHE: dict = {}


def _pool_from(pool):
    """Accept a bare TilePool (tests/back-compat) or a ``(ObjectRef,)`` wrapper
    (nested refs are NOT auto-resolved by Ray, so the task receives the tiny ref
    and this worker-local cache deserializes the pool once per worker)."""
    if isinstance(pool, tuple):
        ref = pool[0]
        key = ref.hex()
        p = _POOL_CACHE.get(key)
        if p is None:
            p = _POOL_CACHE[key] = ray.get(ref)
        return p
    return pool


def _gather_payload(payload_refs) -> tuple[pa.Table | None, np.ndarray]:
    """Fetch + concat the per-shard payload parts (INSIDE a tail task, never on the
    driver) and compute the global feature order."""
    tabs = ray.get(list(payload_refs)) if payload_refs else []
    tabs = [t for t in tabs if len(t)]
    if not tabs:
        return None, np.empty(0, np.int64)
    t = pa.concat_tables(tabs, promote_options="default")
    order = np.argsort(t["order"].to_numpy(zero_copy_only=False), kind="stable")
    return t, order


def _run_tail(pool, seq, keys_np, cells_np, rlat, rlon, payload_refs, knn_k,
              json_path, assign_dir, knn_dir, overlay_dir, max_overlay
              ) -> tuple[int, int, int]:
    """The whole batch tail, FUSED into one task body (VERDICT r3 #1): fire the
    kNN ring scatter and the fused overlay bank select+fetch first (their remote
    calls go in flight), do the feature-emit work locally while they fly (ONE
    payload gather now serves BOTH the feature write and the overlay geometry —
    the r3 emit/overlay task pair each gathered it), then finish kNN and overlay
    off the already-in-flight futures. Replaces the r3 emit/kNN/overlay task
    triple: 3 task submissions + their argument ships + a duplicate payload
    gather + one bank RPC round disappear from every batch; outputs are
    byte-identical (same math, same deterministic selection cut)."""
    t0 = time.perf_counter()
    pool = _pool_from(pool)
    skip = os.environ.get("AUGDIFF_DIAG_SKIP_TAILS", "")  # diagnostic only

    # -- fire: kNN scatter (query-point dedup — a modify emits after+before
    # features at the same representative point; the pool serves each DISTINCT
    # point once, results fan back via the inverse) ------------------------------
    keep = np.nonzero(~(np.isnan(rlat) | np.isnan(rlon)))[0]
    if "k" in skip:
        keep = keep[:0]
    knn_state = inv = None
    if len(keep):
        pts = np.stack([rlat[keep], rlon[keep]], axis=1)
        upts, inv = np.unique(pts, axis=0, return_inverse=True)
        if os.environ.get("AUGDIFF_KNN_DEBUG"):
            print(f"[knn {seq}] q={len(keep)} uniq={len(upts)}", flush=True)
        knn_state = pool.knn_scatter(upts[:, 0], upts[:, 1], knn_k)

    # -- fire: overlay bank select+fetch (one fused call per bank shard) ---------
    touched = np.unique(np.asarray(cells_np, np.int64))
    touched = touched[touched >= 0]
    if "o" in skip:
        touched = touched[:0]
    sel_futs = (pool.overlay_select_fetch_scatter(touched, max_overlay)
                if len(touched) else [])

    # -- local while the scatters fly: gather payload once, emit features -------
    t, order = _gather_payload(payload_refs)
    if t is not None:
        nbytes = GJ.write_features_arrow(json_path, t["feature"], order)
    else:
        nbytes = GJ.write_features(json_path, [])
    _write_assignments_file(assign_dir, seq, keys_np, cells_np)
    wkbs_ref = bbs_ref = None
    if t is not None and sel_futs:
        import pyarrow.compute as pc

        bbs = (t["bbox"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(-1, 4)[order])
        # ship the ordered WKB column AS ARROW — shards index it lazily (only
        # bbox-hit features decode), so the 10^4-1 Python bytes objects and the
        # list pickle never materialize
        wkbs_ref = ray.put(pc.take(t["wkb"], order).combine_chunks())
        bbs_ref = ray.put(np.ascontiguousarray(bbs, np.float64))
    t_emit = time.perf_counter() - t0

    # -- finish: kNN (gathers the in-flight ring futures) ------------------------
    knn_t = None
    if knn_state is not None:
        uids, udist = pool.knn_finish(knn_state)
        ids, dist = uids[inv], udist[inv]
        qrow, rank = np.nonzero(np.isfinite(dist))  # top-k packs left → col == rank
        sel_ids = ids[qrow, rank]
        if sel_ids.dtype.kind in "iu":
            # numeric-id pool mode: rebuild the identical ``img-%08d`` strings
            # in Arrow C++ (cast → lpad → join) — no numpy U32 materialization
            import pyarrow.compute as pc

            id_col = pc.binary_join_element_wise(
                pa.scalar("img-"),
                pc.utf8_lpad(pc.cast(pa.array(sel_ids), pa.string()), 8, "0"),
                "",
            )
        else:
            id_col = pa.array(sel_ids)
        knn_t = pa.table(
            {
                "batch_seq": pa.array(np.full(len(qrow), seq, np.int64)),
                "key": pa.array(keys_np[keep[qrow]], pa.int64()),
                "rank": pa.array(rank.astype(np.int64)),
                "image_id": id_col,
                "dist_m": pa.array(dist[qrow, rank]),
            }
        )
    _write_knn_file(knn_dir, seq, knn_t)
    t_knn = time.perf_counter() - t0

    # -- finish: overlay (prefetched blobs + the payload gathered above) ---------
    rows = []
    if sel_futs and wkbs_ref is not None:
        rows = pool.overlay_finish_fetched(
            seq, ray.get(sel_futs), wkbs_ref, bbs_ref, max_overlay
        )
    _write_overlay_file(overlay_dir, seq, rows)
    timings = {"tl_emit": round(t_emit, 3), "tl_knn": round(t_knn - t_emit, 3),
               "tl_ovl": round(time.perf_counter() - t0 - t_knn, 3)}
    return nbytes, 0 if knn_t is None else len(knn_t), len(rows), timings


@ray.remote(num_cpus=0)
def _tail_task(pool, seq, keys_np, cells_np, rlat, rlon, payload_refs, knn_k,
               json_path, assign_dir, knn_dir, overlay_dir, max_overlay):
    """One-submission tail for the non-collector (run_batch) path."""
    return _run_tail(pool, seq, keys_np, cells_np, rlat, rlon, payload_refs,
                     knn_k, json_path, assign_dir, knn_dir, overlay_dir,
                     max_overlay)



def _cell_counts(cells_in, cells_out):
    """Per-cell (in, out) row counts over the union of touched cells — the lineage
    record's math, shared by the collector task and the run_batch finish path."""
    cells_in = np.asarray(cells_in, np.int64)
    cells_out = np.asarray(cells_out, np.int64)
    all_cells = np.union1d(cells_in, cells_out)
    in_counts = np.zeros(len(all_cells), np.int64)
    uc, cnt = np.unique(cells_in, return_counts=True)
    in_counts[np.searchsorted(all_cells, uc)] = cnt
    out_counts = np.zeros(len(all_cells), np.int64)
    uc, cnt = np.unique(cells_out, return_counts=True)
    out_counts[np.searchsorted(all_cells, uc)] = cnt
    return all_cells, in_counts, out_counts


def _stream_depth(hint: int | None = None) -> int:
    """In-flight window: AUGDIFF_STREAM_DEPTH (>0) overrides, else width-scaled
    (cpus//3, min 5); always capped by the number of batches actually left."""
    env = os.environ.get("AUGDIFF_STREAM_DEPTH", "")
    d = int(env) if env else 0
    if d <= 0:
        d = max(5, int(ray.cluster_resources().get("CPU", 8)) // 3)
    if hint:
        d = min(d, max(1, int(hint)))
    return d


@ray.remote(num_cpus=0)
def _collect_tail_task(aug, seq, cells_in, pool, knn_k,
                       json_path, assign_dir, knn_dir, overlay_dir, max_overlay):
    """Whole batch tail as ONE off-driver task: gather the per-shard render META,
    derive the feature order / kNN queries / touched cells, run the FUSED tail
    body inline (``_run_tail`` — the kNN/overlay scatters go in flight first and
    the emit work overlaps them in this worker), and pre-aggregate the per-cell
    lineage counts. ``aug`` is the resolved AugmentShard result (Ray awaits the
    augment future before scheduling this task): either per-render-shard meta
    futures + payload refs (pool render) or a complete meta table + one payload
    ref (local render inside the augment actor). The driver's per-batch cost for
    everything after the closure is one task submission plus one small ray.get."""
    t0 = time.perf_counter()
    payload_refs = aug["payload_refs"]
    if aug["meta_futs"] is not None:
        metas = ray.get(list(aug["meta_futs"]))
        meta = pa.concat_tables(metas, promote_options="default")
    else:
        meta = aug["meta"]
    t_render = time.perf_counter() - t0
    order = np.argsort(meta["order"].to_numpy(zero_copy_only=False), kind="stable")
    keys_np = meta["key"].to_numpy(zero_copy_only=False)[order]
    cells_np = meta["cell"].to_numpy(zero_copy_only=False)[order]
    rlat = meta["rep_lat"].to_numpy(zero_copy_only=False)[order]
    rlon = meta["rep_lon"].to_numpy(zero_copy_only=False)[order]
    t_prep = time.perf_counter() - t0
    t1 = time.perf_counter()
    nbytes, knn_rows, n_overlay, tail_t = _run_tail(
        pool, seq, keys_np, cells_np, rlat, rlon, payload_refs, knn_k,
        json_path, assign_dir, knn_dir, overlay_dir, max_overlay,
    )
    t_tails = time.perf_counter() - t1
    # per-cell lineage counts (same math as AdiffJob._lineage_rows; the driver only
    # stamps wall_ms and builds the row dicts at commit time)
    all_cells, in_counts, out_counts = _cell_counts(cells_in, cells_np)
    return {
        "n_features": len(meta), "nbytes": nbytes, "knn": knn_rows,
        "overlay": n_overlay, "all_cells": all_cells, "in_counts": in_counts,
        "out_counts": out_counts, "t_render_wait": round(t_render, 3),
        "t_coll_prep": round(t_prep, 3), "t_coll_tails": round(t_tails, 3),
        "tail_t": tail_t, "n_aug": aug["n_aug"], "aug_stage_t": aug["stage_t"],
    }


def render_partition_scatter(
    pool: list, big: pa.Table, sel: np.ndarray, flags_sorted: np.ndarray,
    row_keys: np.ndarray, ents_sorted: np.ndarray,
    all_edges: tuple[np.ndarray, np.ndarray], seq: int,
) -> tuple[list, list]:
    """Dependency-partitioned render over the persistent actor pool (module-level
    so the off-driver augment stage can invoke it with the same handles).

    Entities split across N shards at balanced cumulative cost; shard ``s``
    receives the Arrow sub-table of rows whose key is one of its entities OR a
    closure-dependency of one (edge ``(a, b)`` = "b depends on a", so a shard
    rendering parent ``b`` needs ``a``'s rows). Each actor builds a context over
    ONLY that subset — per-actor cost is O(rows/N · dup), not O(rows), which is
    what makes the render stage actually scale with pool size. Partitioning
    assumption: the transitive closure is complete (local_closure), so a shard's
    subset always contains every row its predicates may touch."""
    t_prep0 = time.perf_counter()
    N = len(pool)
    n_ents = len(ents_sorted)
    # SPATIAL shard assignment: entities grouped by their first row's cell, cells
    # laid out contiguously, cut at balanced cumulative COST. A way's nodes share
    # its cell, so dependency rows duplicate only at cell-chunk boundaries — the
    # strided split shipped every way's node rows to a second shard and its total
    # shipped rows grew with the pool (the render stage's scaling ceiling).
    uk, first_idx, uk_rows = np.unique(
        row_keys, return_index=True, return_counts=True
    )
    cells_col = big["cell"].to_numpy(zero_copy_only=False)[sel]
    pos_in_uk = np.searchsorted(uk, ents_sorted)
    ent_cell = cells_col[first_idx[pos_in_uk]]
    own_rows = uk_rows[pos_in_uk].astype(np.float64)

    # edges: (a, b) = "b depends on a" → parent b's shard also needs a's rows
    ek_order = np.argsort(ents_sorted, kind="stable")
    ek_sorted = ents_sorted[ek_order]
    edge_a, edge_b = all_edges
    if len(edge_a):
        pos = np.searchsorted(ek_sorted, edge_b)
        ok = (pos < len(ek_sorted)) & (ek_sorted[np.minimum(pos, len(ek_sorted) - 1)] == edge_b)
        parent_ent = ek_order[pos[ok]]  # entity index of each edge's parent
        child_keys = edge_a[ok]
    else:
        parent_ent = np.empty(0, np.int64)
        child_keys = np.empty(0, np.int64)

    # cost model (units ≈ per-row ctx-build cost, ~5µs): a shard's wall is context
    # build over its shipped rows (own + dep) PLUS per-entity feature assembly
    # (geometry + JSON ≈ 80-250µs/entity — the dominant term, so entity weights
    # carry most of the balance; measured per type on the scaling world)
    dep_rows = np.zeros(n_ents, np.float64)
    if len(child_keys):
        cpos = np.searchsorted(uk, child_keys)
        cok = (cpos < len(uk)) & (uk[np.minimum(cpos, len(uk) - 1)] == child_keys)
        np.add.at(dep_rows, parent_ent[cok], uk_rows[cpos[cok]].astype(np.float64))
    tf = np.array([15.0, 40.0, 110.0, 1.0])[ents_sorted & 3]
    # row coefficient 2: measured ctx build ≈ 9µs per (cache-miss) row against the
    # ~5µs/unit scale of tf — at 1.0 the row-heavy chunk (the cell-less relation
    # cluster and its dependency rows) ran ~1.5× the other shards every batch
    ent_w = 2.0 * (own_rows + dep_rows) + tf
    # group at a coarser cell (16× per dim): a way's nodes sit in NEIGHBORING fine
    # cells, so fine-cell chunks still cut through every way; coarse chunks keep
    # whole neighborhoods on one shard and only coarse-boundary deps duplicate
    coarse = np.where(ent_cell >= 0, C.parent(ent_cell, max(0, C.DEFAULT_RES - 4)), -1)
    by_cell = np.lexsort((ents_sorted, ent_cell, coarse))
    cum = np.cumsum(ent_w[by_cell])
    # 4N weight-balanced chunks interleaved over N shards: the cost model is an
    # estimate, and one contiguous chunk per shard makes its error the straggler;
    # four spread chunks average it out (still cell-contiguous → dup stays low)
    n_chunks = 4 * N
    bounds = cum[-1] * (np.arange(1, n_chunks) / n_chunks)
    ent_shard = np.empty(n_ents, np.int64)
    ent_shard[by_cell] = np.searchsorted(bounds, cum, side="left") % N

    dem_shard = np.concatenate([ent_shard, ent_shard[parent_ent]])
    dem_key = np.concatenate([ents_sorted, child_keys])
    # unique (shard, key) demands
    o = np.lexsort((dem_key, dem_shard))
    ds, dk = dem_shard[o], dem_key[o]
    keep = np.r_[True, (ds[1:] != ds[:-1]) | (dk[1:] != dk[:-1])]
    ds, dk = ds[keep], dk[keep]

    rk_order = np.argsort(row_keys, kind="stable")
    rk_sorted = row_keys[rk_order]
    # the undeduped concat broadcasts ONCE (zero-copy Arrow in the object store);
    # each shard takes its own subset in parallel on the actor — the driver ships
    # index arrays, not N serialized sub-tables (was the scatter's serial cost)
    big_ref = ray.put(big)
    meta_futs, payload_refs = [], []
    for s in range(N):
        keys_s = dk[ds == s]
        lo = np.searchsorted(rk_sorted, keys_s, side="left")
        hi = np.searchsorted(rk_sorted, keys_s, side="right")
        lens = hi - lo
        tot = int(lens.sum())
        flat = rk_order[
            np.repeat(lo, lens) + (np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens))
        ]
        flat.sort()  # preserve the table's deterministic row order in the subset
        mine = np.flatnonzero(ent_shard == s)  # == these entities' order indices
        mk = ents_sorted[mine]
        m, p = pool[s].render_part_idx.remote(
            seq, big_ref, sel[flat], flags_sorted[flat], mine.tolist(),
            [K.TYPE_NAMES[c] for c in (mk & 3).tolist()],
            (mk >> 2).tolist(),
        )
        meta_futs.append(m)
        payload_refs.append(p)
    if os.environ.get("AUGDIFF_STAGE_DEBUG"):
        print(f"[render] prep={time.perf_counter()-t_prep0:.3f} "
              f"dup={len(dk)/max(len(uk),1):.2f}", flush=True)
    return meta_futs, payload_refs


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
        max_overlay_tiles_per_batch: int = 64,
        parallel_fetch: bool | str = "auto",
        distributed_render: bool = True,
        node_latest_only: bool = True,
        adiff_template: str | None = None,
        osc_template: str | None = None,
    ):
        self.world = Path(world_root)
        self.out = Path(out_root)
        self.out.mkdir(parents=True, exist_ok=True)
        self.num_shards = num_shards
        if render_concurrency is None:
            from .indexer import pool_size

            env = os.environ.get("AUGDIFF_RENDER_POOL", "")
            # frac 0.5: with the kNN/overlay tails vectorized (r5) the render
            # pool became the stream's throughput cap — at 32 CPUs the
            # quarter-width pool (8 actors) held the whole stream at 0.34
            # s/batch while 16 actors reach the ~0.28 work floor; the dup
            # factor is chunking-driven, not width-driven (1.57 @ 8 → 1.61
            # @ 16 shards), so the wider pool costs almost no extra work
            render_concurrency = (int(env) if env
                                  else max(2, pool_size(frac=0.5, cap=16)))
        self.render_concurrency = render_concurrency
        self.save_interval = save_interval
        self.drop_tags_on_load = drop_tags_on_load
        self.knn_k = knn_k
        self.max_overlay = max_overlay_tiles_per_batch
        self.parallel_fetch = parallel_fetch
        self.distributed_render = distributed_render
        self.node_latest_only = node_latest_only

        self.snapshot_store = str(self.out / "snapshot_store")
        self.index_root = str(self.out / "index")
        self.memory_root = self.out / "memory"
        # reference --jsontemplate parity (AugmentedDiff.scala:217-223): AAA/BBB/CCC
        # substitute the zero-padded sequence path; plain paths AND pyarrow-fs URIs
        # (file/s3/hdfs/gs) both work — the sink commits atomically either way
        self.osc_template = osc_template
        self.adiff_template = adiff_template or str(
            self.out / "adiff" / "AAA" / "BBB" / "CCC.ndjson"
        )
        self.lineage = Lineage(str(self.out / "lineage"))
        self.store: IndexStore | None = None
        self._tiles: TilePool | None = None
        self._parse_futs: dict[int, "ray.ObjectRef"] = {}
        self._memory_tbls: list[pa.Table] | None = None  # lazy in-process tier cache
        # (seq, ObjectRef) per tier segment — shipped (refs only) to the augment
        # shard pool each stream batch; same lifecycle as _memory_tbls
        self._memory_refs: list[tuple[int, "ray.ObjectRef"]] = []
        # identity hashes cached per memory table: a row's hash never changes, so the
        # augment dedup re-hashes only update+storage rows each batch, not the whole
        # accumulated tier (the stream's dominant driver-serial growth term)
        self._memory_hashes: list[tuple[np.ndarray, np.ndarray]] | None = None
        # (packed key, ts, trank) per memory table, same lifecycle as the hashes —
        # the augment semi-join + tier prune read these instead of re-deriving them
        # from the whole accumulated tier every batch
        self._memory_meta: list[tuple[np.ndarray, np.ndarray, np.ndarray]] | None = None
        self._pending_index_futs: list = []  # live-shard appends, joined at next pre
        self._file_threads: dict[int, threading.Thread] = {}  # durability writers
        self._flush_inflight: tuple | None = None  # (seq, thread, tier-prefix len)
        self._flush_result: tuple | None = None  # set by _flush_build thread

    def _osc_path(self, seq: int) -> str:
        if self.osc_template is not None:
            # reference --osctemplate parity (AugmentedDiff.scala:217-223): AAA/BBB/CCC
            # substitution over any URI read_osc_file resolves (file/http(s)/s3/hdfs,
            # gz/bz2 sniffed); with a template, run_stream needs an explicit end —
            # remote layouts can't be enumerated to infer one
            aaa, bbb, ccc = OSC.sequence_path(seq).split("/")
            return (self.osc_template.replace("AAA", aaa)
                    .replace("BBB", bbb).replace("CCC", ccc))
        return str(self.world / "changes" / OSC.sequence_path(seq)) + ".osc"

    def _prefetch_parse(self, seq: int) -> None:
        """Parse batch ``seq``'s OSC XML in a Ray task while earlier batches run —
        takes the XML decode off the driver's serial critical path."""
        if seq in self._parse_futs:
            return
        path = self._osc_path(seq)
        from urllib.parse import urlparse

        # local paths are existence-checked (a missing file just isn't prefetched);
        # remote URIs submit directly — read_osc_file owns fetch retry/backoff
        if urlparse(path).scheme in ("http", "https", "s3", "hdfs", "file") or os.path.exists(path):
            self._parse_futs[seq] = _parse_osc_task.remote(path, seq)

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

    def warm(self) -> None:
        """Build the serving state once, before the first batch: tile-pool shard loads
        (blocking), snapshot hot-cache tier, render actor pool, first OSC parses.
        Idempotent (and ~free on a second call) — belongs to startup, not to the first
        request's latency."""
        if getattr(self, "_warmed", False):
            return
        # launch the first parses NOW so the XML decode overlaps the shard/cache
        # loads below — in steady state parse is prefetched batches ahead (~0 on the
        # critical path); without this the stream-window EDGE pays it serially
        self._prefetch_first_parses(6)
        self._tile_pool().warm()
        SNAP.warm_cache(self.snapshot_store)
        if self.distributed_render:
            # block until every render actor's process is up with the by-value
            # package imported — otherwise batch 1's render pays the cold start
            ray.get([a.ping.remote() for a in self._render_pool()])
        # augment shards build their snapshot hot-caches in __init__ — barrier here
        # so batch 1's augment doesn't pay the store scan
        ray.get([a.ping.remote() for a in self._aug_pool()])
        if self.store is None:
            self.store = IndexStore(self.index_root, num_shards=self.num_shards)
            self.store.start_pool()
        # spin task workers with the package imported: the parse/tail remote FUNCTIONS
        # (num_cpus=0 — they all run concurrently, each on its OWN worker process)
        # otherwise pay worker spawn + by-value package import inside batch 1's
        # tail_wait. Sized to the in-flight task census at full pipeline depth
        # (3 tail tasks × depth 2 + parse prefetches + durability), capped by the
        # node width Ray keeps as its idle-worker soft limit.
        depth = _stream_depth(getattr(self, "_stream_hint", None))
        # census: one collector + 3 tails per in-flight batch + parse prefetches.
        # NB Ray's idle-worker reaper culls processes beyond ~num_cpus between
        # batches (cold respawn = worker spawn + by-value package import inside a
        # batch's tail); bench children disable it via
        # RAY_kill_idle_workers_interval_ms=0 so a deep pipeline keeps its pool.
        ray.get([_warm_worker.remote()
                 for _ in range(max(8, min(64, 4 * depth + 8)))])
        self._warmed = True

    def _prefetch_first_parses(self, n: int = 2) -> None:
        """Prefetch-parse the first ``n`` uncommitted batches (idempotent)."""
        osc_files = sorted((self.world / "changes").rglob("*.osc"))
        done = self.lineage.completed()
        todo = [s for s in range(1, len(osc_files) + 1) if s not in done][:n]
        for s in todo:
            self._prefetch_parse(s)

    def _tile_pool(self) -> TilePool:
        """Cell-sharded tile index + overlay bank actor pool (persistent across batches):
        each shard holds only its cells' centroid rows and bank blobs — the driver never
        materializes the tile table (VERDICT r1 #3)."""
        if self._tiles is None:
            from .indexer import pool_size

            # kNN is the tails' heaviest parallel stage and each shard serves one
            # call at a time — size the pool to the FULL node width: the ring
            # routing still touches only the 1-2 shards a query's cell interval
            # intersects, so more shards divide per-actor queue time (the
            # pipeline-fill convoy, the r3 stream's latency term) without
            # broadcasting work. Capped by the tile count (parquet metadata, no
            # scan): a small world gets a few shards, not a width's worth of
            # actor spawns + warm-ups amortized over nothing.
            tiles_path = self.out / "tiles_decoded.parquet"
            try:  # footer-only row count; the store may be a file or a directory
                files = ([tiles_path] if tiles_path.is_file()
                         else sorted(tiles_path.rglob("*.parquet")))
                n_tiles = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
                if not files:
                    n_tiles = 1 << 30
            except Exception:
                n_tiles = 1 << 30
            env = os.environ.get("AUGDIFF_KNN_POOL", "")
            self._tiles = TilePool(
                str(tiles_path),
                str(self.out / "overlay_bank.parquet"),
                num_shards=(int(env) if env else
                            max(2, min(pool_size(frac=1.0, cap=48),
                                       n_tiles // 8_000 + 1))),
            )
        return self._tiles

    def _tile_pool_ref(self) -> tuple:
        """(ObjectRef,) wrapper of the TilePool handle for tail tasks — see
        ``_pool_from``: unpickling the pool's actor handles per task was a
        measured ~10 ms × 3 tasks × batch of deserialize overhead."""
        if getattr(self, "_tiles_ref", None) is None:
            self._tiles_ref = (ray.put(self._tile_pool()),)
        return self._tiles_ref

    # -- one micro-batch (pre → render → async tail → finish) ----------------
    #
    # The batch splits THREE ways: a PRE stage (parse → closure → augment + the
    # durable per-batch state the NEXT batch reads: memory tier, index append), a
    # RENDER fan-out over the persistent actor pool, and a TAIL (feature emit, kNN,
    # overlay, output writes) that runs as one off-driver task. ``run_stream``
    # software-pipelines all three: while batch k renders on the actors, the driver
    # runs k+1's PRE; k's tail overlaps k+1's render. The r1 driver-serial Amdahl
    # term is gone from the critical path at every pool width. The lineage commit
    # for k happens only in ``_finish_batch`` after k's tail is durable; a kill in
    # between recomputes k (idempotent writes → byte-identical, tested).

    def _run_pre(self, seq: int, stream: bool = False) -> dict:
        t0 = time.perf_counter()
        # publish the background flush BEFORE this batch reads any tier state, and
        # BLOCK for it: which tier serves a row is output-visible (storage rows drop
        # tags — reference parity, SURVEY §4.4.1), so the tier→storage boundary must
        # be deterministic, not thread-timing-dependent. Flushed rows become
        # storage-visible exactly at the next batch — the same boundary as the old
        # synchronous flush; the flush WORK still overlaps the flush batch's own
        # render + tails (≈ one batch cycle of it off the critical path).
        stage_t: dict[str, float] = {}

        def _mark(name, t_start):
            stage_t[name] = round(time.perf_counter() - t_start, 3)
            return time.perf_counter()

        ts = time.perf_counter()
        self._adopt_flush(block=True)
        ts = _mark("adopt", ts)

        ts = time.perf_counter()
        fut = self._parse_futs.pop(seq, None)
        if fut is None:  # no prefetch was possible (direct run_batch call)
            fut = _parse_osc_task.remote(self._osc_path(seq), seq)
        # block on the prefetched parse (launched ≥1 batch ago): re-parsing
        # locally on a not-ready-this-instant future duplicated the whole XML
        # decode on the driver's serial path. The ref itself lives on — it IS the
        # memory-tier segment and the augment shard's input (zero re-puts).
        update_el = ray.get(fut)
        ts = _mark("parse", ts)

        # J3/J4: local closure against the shared index (actor pool 2-hop fetch, S11).
        # Pure int64 numpy end-to-end — the per-batch Python set/dict fixpoint was the
        # stream's largest driver-serial term at real churn (equivalence pytest-asserted
        # against the set-based transcription in tests/test_closure.py).
        row_a, row_b = edges_from_rows_np(update_el)
        if self._pending_index_futs:  # previous batch's live-shard appends land here,
            ray.get(self._pending_index_futs)  # before this batch's 2-hop fetch
            self._pending_index_futs = []
        ex_a, ex_b = self.store.load_edges_np(np.unique(row_b))
        new_a, new_b, all_a, all_b = local_closure_np(row_a, row_b, ex_a, ex_b)
        ts = _mark("closure", ts)

        # J5: semi-join fetch from memory + storage tiers — stays Arrow end-to-end
        aug_fut = None
        if stream:
            # submit to the augment shard pool on the tier-ref SNAPSHOT as of this
            # batch (segment seq is appended below, AFTER the submit — explicit
            # snapshot semantics, no race); the heavy augment+scatter work pipelines
            # across batches off the driver's serial chain
            self._ensure_memory_state()
            pool = self._aug_pool()
            aug_fut = pool[seq % len(pool)].augment_scatter.remote(
                seq, fut, list(self._memory_refs), all_a, all_b
            )
            # memory-tier hash cache entry stays LAZY in stream mode (None →
            # computed on first non-stream consumer): row_hashes over a 10^5-row
            # update was ~0.1 s of driver serial per batch, and the stream path's
            # dedup runs on the augment shards, which hash their own segments
            upd_hashes = None
        else:
            memory = self._read_memory()
            upd_hashes = row_hashes(update_el)  # shared: augment dedup + tier cache
            aug_big, aug_rep, aug_flag, aug_order = augment_parts(
                update_el, memory, (all_a, all_b), self.snapshot_store,
                drop_tags_on_load=self.drop_tags_on_load,
                parallel_fetch=self.parallel_fetch,
                memory_hashes=self._memory_hash_cat(),
                update_hashes=upd_hashes,
                memory_meta=self._memory_meta_cat(),
                # drop dead node versions from the render domain (output-identical —
                # see stages.augment.node_history_prune; equivalence pytest-asserted):
                # hot keys otherwise re-ship their whole accumulated history to every
                # render shard every batch, a per-batch cost growing with stream length
                node_latest_only=self.node_latest_only,
            )
            aug_sel = aug_rep[aug_order]  # deduped+sorted domain → index into aug_big
            aug_flag_sorted = aug_flag[aug_order]
            # entity work-list, vectorized: unique packed keys ordered (type rank, id)
            row_keys = K.pack_typed(aug_big["id"], aug_big["type"])[aug_sel]
            ents_sorted = np.unique(row_keys)
            ents_sorted = ents_sorted[np.lexsort((ents_sorted >> 2, ents_sorted & 3))]
        ts = _mark("augment", ts)

        # durable state the NEXT batch's pre reads — memory tier append (T2) + index
        # incremental append (S10) — lands HERE, before render, so batch k+1's pre can
        # start while k renders. Idempotent by batch name (crash → recompute).
        # RAM state (memory-tier cache + live index shards) advances now — batch k+1's
        # pre reads it; the DURABILITY file writes run off the serial path and are
        # joined before this batch's lineage commit (crash before commit → the batch
        # recomputes and rewrites the same idempotent files)
        self._write_memory_cache(update_el, upd_hashes, seq=seq, ref=fut)
        self._pending_index_futs = self.store.append_pool_futures(new_a, new_b)
        if seq % self.save_interval == 0:
            # ASYNC flush: the build half (join prior durability writes, write this
            # batch's files, concat the tier, write the delta file, fold the rows
            # into a NEW hot-cache table) runs in a background thread over immutable
            # inputs; the driver adopts the result (dict swap + tier-prefix drop +
            # file unlinks) at a later batch boundary (_adopt_flush). Until adoption
            # the stream keeps serving the un-flushed tier — the delta file already
            # existing on disk is exactly the tested mid-flush-crash/resume state
            # (suspect-fingerprint dedup makes tier-duplicated rows byte-identical).
            # The lineage commit of ``seq`` still joins this thread first
            # (_file_threads[seq]), so commit ⇒ flush durable.
            self._adopt_flush(block=True)  # at most one flush in flight
            prev = list(self._file_threads.values())
            self._file_threads.clear()
            tbls = list(self._memory_tbls) if self._memory_tbls else None
            th = threading.Thread(
                target=self._flush_build,
                args=(seq, update_el, new_a, new_b, prev, tbls),
            )
            th.start()
            self._file_threads[seq] = th
            self._flush_inflight = (seq, th, len(tbls) if tbls else 0)
        else:
            th = threading.Thread(
                target=self._durable_writes, args=(seq, update_el, new_a, new_b)
            )
            th.start()
            self._file_threads[seq] = th
        ts = _mark("emit", ts)

        if stream:
            return {
                "seq": seq, "t0": t0, "stage_t": stage_t, "aug_fut": aug_fut,
                "update_el": update_el, "n_new_edges": len(new_a),
            }
        return {
            "seq": seq, "t0": t0, "stage_t": stage_t,
            "aug_big": aug_big, "aug_sel": aug_sel, "aug_flag": aug_flag_sorted,
            "row_keys": row_keys, "ents_sorted": ents_sorted,
            "all_edges": (all_a, all_b),
            "update_el": update_el, "n_aug": len(aug_sel),
            "n_new_edges": len(new_a),
        }

    def _render_scatter(self, pre: dict) -> dict:
        """Launch the render fan-out (non-blocking). Below ~3k entities the scatter
        costs more than the geometry work → render locally at collect time."""
        ents_sorted = pre["ents_sorted"]
        use_pool = (
            self.distributed_render
            and len(ents_sorted) >= (0 if self.distributed_render == "force" else 3000)
        )
        ts = time.perf_counter()
        if use_pool and len(ents_sorted) > 0:
            meta_futs, payload_refs = self._render_partition_scatter(
                pre["aug_big"], pre["aug_sel"], pre["aug_flag"],
                pre["row_keys"], ents_sorted, pre["all_edges"],
                pre["seq"],
            )
            out = {"futs": meta_futs, "payload_refs": payload_refs}
        else:
            out = {"futs": None, "payload_refs": None}
        pre["stage_t"]["r_scatter"] = round(time.perf_counter() - ts, 3)
        return out

    def _render_collect(self, pre: dict, sc: dict) -> dict:
        """Block for the render META results (a few numeric columns per feature); the
        payload parts stay in the object store for the tail tasks."""
        ts = time.perf_counter()
        if sc["futs"] is not None:
            metas = ray.get(sc["futs"])
            meta = pa.concat_tables(metas, promote_options="default")
            payload_refs = sc["payload_refs"]
        else:
            ents_sorted = pre["ents_sorted"]
            ents = [(K.TYPE_NAMES[int(k) & 3], int(k) >> 2) for k in ents_sorted]
            aug_tbl = pre["aug_big"].combine_chunks().take(pa.array(pre["aug_sel"]))
            ctx = ColumnarRenderContext(aug_tbl, in_update=pre["aug_flag"])
            meta, payload = self._render_local(ctx, ents)
            payload_refs = [ray.put(payload)] if len(payload) else []
        stage_t = pre["stage_t"]
        stage_t["render"] = round(time.perf_counter() - ts, 3)
        order = np.argsort(meta["order"].to_numpy(zero_copy_only=False), kind="stable")
        keys_np = meta["key"].to_numpy(zero_copy_only=False)[order]
        cells_np = meta["cell"].to_numpy(zero_copy_only=False)[order]
        rlat = meta["rep_lat"].to_numpy(zero_copy_only=False)[order]
        rlon = meta["rep_lon"].to_numpy(zero_copy_only=False)[order]
        return {
            "seq": pre["seq"], "t0": pre["t0"], "stage_t": stage_t,
            "n_features": len(meta), "payload_refs": payload_refs,
            "keys_np": keys_np, "cells_np": cells_np, "rlat": rlat, "rlon": rlon,
            "update_el": pre["update_el"], "n_aug": pre["n_aug"],
            "n_new_edges": pre["n_new_edges"],
        }

    def _run_head(self, seq: int) -> dict:
        pre = self._run_pre(seq)
        return self._render_collect(pre, self._render_scatter(pre))

    def _launch_tail(self, head: dict) -> dict:
        """Launch the whole tail (feature emit + kNN rounds + overlay select/render +
        output writes) as ONE fused off-driver task; return its future."""
        ts = time.perf_counter()
        seq = head["seq"]
        fut = _tail_task.remote(
            self._tile_pool_ref(), seq, head["keys_np"], head["cells_np"],
            head["rlat"], head["rlon"], head["payload_refs"] or [], self.knn_k,
            GJ.batch_json_path(self.adiff_template, seq),
            str(self.out / "assignments"), str(self.out / "knn"),
            str(self.out / "overlay"), self.max_overlay,
        )
        head["stage_t"]["t_launch"] = round(time.perf_counter() - ts, 3)
        return {"fut": fut}

    def _finish_batch(self, head: dict, tail: dict) -> dict:
        seq = head["seq"]
        stage_t = head["stage_t"]
        ts = time.perf_counter()

        # the fused tail task returns (emit bytes, kNN rows, overlay rows, timings)
        nbytes, knn_rows, n_overlay, tail_t = ray.get(tail["fut"])
        stage_t.update(tail_t)
        # durability files (memory tier + index batch) must land before the commit;
        # for a flush batch the registered thread is the flush build — adopt it
        # (join + publish) rather than bare-joining
        if self._flush_inflight is not None and self._flush_inflight[0] == seq:
            self._adopt_flush(block=True)
        th = self._file_threads.pop(seq, None)
        if th is not None:
            th.join()
        stage_t["tail_wait"] = round(time.perf_counter() - ts, 3)

        # lineage commit — marks the batch done
        wall_ms = (time.perf_counter() - head["t0"]) * 1000.0
        update_el = head["update_el"]
        cells_in = (update_el["cell"].to_numpy(zero_copy_only=False)
                    if len(update_el) else np.empty(0, np.int64))
        all_cells, in_counts, out_counts = _cell_counts(cells_in, head["cells_np"])
        self.lineage.commit_arrays(
            seq, all_cells, in_counts, out_counts, int(nbytes), float(wall_ms)
        )
        return {
            "seq": seq,
            "update_rows": len(head["update_el"]),
            "aug_rows": head["n_aug"],
            "features": head["n_features"],
            "new_edges": head["n_new_edges"],
            "knn": knn_rows,
            "overlay": n_overlay,
            "wall_ms": wall_ms,
            "stage_sec": stage_t,
        }

    def run_batch(self, seq: int) -> dict:
        head = self._run_head(seq)
        return self._finish_batch(head, self._launch_tail(head))

    def _launch_collector(self, pre: dict) -> tuple:
        """Collector launch: submit the whole collect+tail as one off-driver task
        (Ray awaits the augment shard's result before scheduling it); keep just the
        commit inputs on the driver."""
        ts = time.perf_counter()
        update_el = pre.pop("update_el")
        cells_in = (update_el["cell"].to_numpy(zero_copy_only=False)
                    if len(update_el) else np.empty(0, np.int64))
        fut = _collect_tail_task.remote(
            pre.pop("aug_fut"), pre["seq"], cells_in,
            self._tile_pool_ref(), self.knn_k,
            GJ.batch_json_path(self.adiff_template, pre["seq"]),
            str(self.out / "assignments"), str(self.out / "knn"),
            str(self.out / "overlay"), self.max_overlay,
        )
        pre["update_rows"] = len(update_el)
        pre["stage_t"]["t_launch"] = round(time.perf_counter() - ts, 3)
        return ("collector", pre, fut)

    def _finish_collector(self, pre: dict, fut) -> dict:
        seq = pre["seq"]
        stage_t = pre["stage_t"]
        ts = time.perf_counter()
        res = ray.get(fut)
        stage_t["w_coll"] = round(time.perf_counter() - ts, 3)
        t2 = time.perf_counter()
        if self._flush_inflight is not None and self._flush_inflight[0] == seq:
            self._adopt_flush(block=True)
        th = self._file_threads.pop(seq, None)
        if th is not None:
            th.join()
        stage_t["w_join"] = round(time.perf_counter() - t2, 3)
        stage_t["tail_wait"] = round(time.perf_counter() - ts, 3)
        stage_t["render"] = res["t_render_wait"]
        stage_t["c_prep"] = res.get("t_coll_prep", 0.0)
        stage_t["c_tails"] = res.get("t_coll_tails", 0.0)
        stage_t.update(res.get("tail_t") or {})
        stage_t.update(res.get("aug_stage_t") or {})
        wall_ms = (time.perf_counter() - pre["t0"]) * 1000.0
        self.lineage.commit_arrays(
            seq, res["all_cells"], res["in_counts"], res["out_counts"],
            int(res["nbytes"]), float(wall_ms),
        )
        return {
            "seq": seq,
            "update_rows": pre["update_rows"],
            "aug_rows": res["n_aug"],
            "features": res["n_features"],
            "new_edges": pre["n_new_edges"],
            "knn": res["knn"],
            "overlay": res["overlay"],
            "wall_ms": wall_ms,
            "stage_sec": stage_t,
        }

    # -- render paths --------------------------------------------------------

    def _render_pool(self) -> list:
        if getattr(self, "_pool_actors", None) is None:
            self._pool_actors = [RenderShard.remote() for _ in range(self.render_concurrency)]
        return self._pool_actors

    def _aug_pool(self) -> list:
        """Augment shard pool (stream path): P persistent actors, batch seq routed
        ``seq % P``. P bounds the augment stages in flight; each actor holds its own
        snapshot hot-cache + tier-segment cache (bounded by the flush window)."""
        if getattr(self, "_aug_actors", None) is None:
            render = self._render_pool() if self.distributed_render else []
            # bake ctor args into an arg-free subclass (stages.tiles.configured):
            # restartable actors with object-store ctor args can't replay a restart
            # once the arg refs are lost (ray#53727) — a baked class carries its
            # config in the exported class definition, so max_restarts is honest
            baked = T.configured(
                AugmentShard,
                snapshot_root=self.snapshot_store,
                drop_tags_on_load=self.drop_tags_on_load,
                parallel_fetch=self.parallel_fetch,
                node_latest_only=self.node_latest_only,
                distributed_render=self.distributed_render,
                render_actors=render,
            )
            actor_cls = ray.remote(
                num_cpus=0, max_restarts=2, max_task_retries=2)(baked)
            from .indexer import pool_size

            env = os.environ.get("AUGDIFF_AUG_POOL", "")
            # width-scaled (~CPU/5, floor 3): at 2× the canonical churn the
            # 3-actor pool became the stream's throughput cap (augment latency
            # doubles with update rows while its pool bounded concurrency at
            # 3 — 13.5 → 11.5 s at 32 CPUs with 6 actors, parity at the
            # canonical churn and at 8 CPUs). Each actor carries a snapshot
            # hot-cache, so the pool doesn't scale to full width.
            n_aug = int(env) if env else max(3, pool_size(frac=0.2, cap=8))
            self._aug_actors = [actor_cls.remote() for _ in range(n_aug)]
        return self._aug_actors

    def _render_partition_scatter(
        self, big: pa.Table, sel: np.ndarray, flags_sorted: np.ndarray,
        row_keys: np.ndarray, ents_sorted: np.ndarray,
        all_edges: tuple[np.ndarray, np.ndarray], seq: int,
    ) -> list:
        return render_partition_scatter(
            self._render_pool(), big, sel, flags_sorted, row_keys, ents_sorted,
            all_edges, seq,
        )

    def _render_local(self, ctx: ColumnarRenderContext, ents) -> pa.Table:
        return render_entities(
            ctx, T.CellAssigner(),
            list(range(len(ents))), [e[0] for e in ents], [e[1] for e in ents],
        )

    # -- memory tier ---------------------------------------------------------

    def _ensure_memory_state(self) -> None:
        # in-process tier cache: files are the durable truth (resume reloads them
        # lazily), but within a run the tier is append-only between flushes — reading
        # every file back each batch was an O(batches-since-flush) driver-serial term
        if self._memory_tbls is None:
            files = sorted(self.memory_root.glob("batch-*.parquet")) if self.memory_root.exists() else []
            self._memory_tbls = [pq.read_table(f) for f in files]
            self._memory_hashes = [row_hashes(t) for t in self._memory_tbls]
            self._memory_meta = [table_meta(t) for t in self._memory_tbls]
            # object-store refs of the same segments, for the augment shard pool
            # (resume path: re-put the reloaded files once)
            self._memory_refs = [
                (int(f.name.split("-")[1].split(".")[0]), ray.put(t))
                for f, t in zip(files, self._memory_tbls)
            ]

    def _read_memory(self) -> pa.Table:
        self._ensure_memory_state()
        if not self._memory_tbls:
            return None
        return pa.concat_tables(self._memory_tbls, promote_options="default")

    def _memory_hash_cat(self) -> tuple[np.ndarray, np.ndarray] | None:
        if self._memory_hashes:
            # stream-mode entries are lazy (None) — fill on first consumer
            for i, h in enumerate(self._memory_hashes):
                if h is None:
                    self._memory_hashes[i] = row_hashes(self._memory_tbls[i])
        if not self._memory_hashes:
            return None
        return (
            np.concatenate([h[0] for h in self._memory_hashes]),
            np.concatenate([h[1] for h in self._memory_hashes]),
        )

    def _memory_meta_cat(self) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        if not self._memory_meta:
            return None
        return tuple(
            np.concatenate([m[i] for m in self._memory_meta]) for i in range(3)
        )

    def _write_memory_file(self, seq: int, table: pa.Table) -> None:
        self.memory_root.mkdir(parents=True, exist_ok=True)
        tmp = self.memory_root / f"batch-{seq:09d}.tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.memory_root / f"batch-{seq:09d}.parquet")

    def _write_memory_cache(
        self, table: pa.Table, hashes: tuple[np.ndarray, np.ndarray],
        seq: int | None = None, ref=None,
    ) -> None:
        if self._memory_tbls is not None:
            self._memory_tbls.append(table)
            self._memory_hashes.append(hashes)
            self._memory_meta.append(table_meta(table))
            if seq is not None:
                self._memory_refs.append((seq, ref if ref is not None else ray.put(table)))

    def _durable_writes(self, seq: int, table: pa.Table, new_a, new_b) -> None:
        """File-durability half of the per-batch emit (runs in a worker thread —
        Arrow tables are immutable and pq.write_table releases the GIL)."""
        self._write_memory_file(seq, table)
        self.store.append_batch_files(new_a, new_b, seq)

    def _flush_build(
        self, seq: int, update_el: pa.Table, new_a, new_b, prev_threads, tbls
    ) -> None:
        """Background half of the memory-tier flush (same durable result as
        :meth:`_flush_memory`, split so the driver's critical path never blocks on
        it). Touches NO shared driver state — only files and immutable tables; the
        driver publishes via :meth:`_adopt_flush`."""
        for t in prev_threads:  # all memory/index files < seq land first
            t.join()
        self._write_memory_file(seq, update_el)
        self.store.append_batch_files(new_a, new_b, seq)
        files = [
            f for f in sorted(self.memory_root.glob("batch-*.parquet"))
            if int(f.name.split("-")[1].split(".")[0]) <= seq
        ]
        if tbls:
            rows = pa.concat_tables(tbls, promote_options="default")
        elif files:  # resume path: the RAM tier was never built this process
            rows = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default"
            )
        else:
            self._flush_result = (seq, None, None, [], None, [])
            return
        SNAP.append_delta(rows, self.snapshot_store, seq)
        # the driver's own hot cache is NOT re-merged here: with the augment stage
        # off-driver, only the AugmentShard processes point-read the store — each
        # folds the flushed rows itself at adoption (rows_ref below). The driver
        # cache is simply dropped at adoption and lazily rebuilt from disk if a
        # non-stream path (run_batch) reads it again. merged_cache on 10^6 cached
        # rows was the flush build's dominant term and it blocked the next pre.
        rows_ref = ray.put(rows) if getattr(self, "_aug_actors", None) else None
        flushed_seqs = [int(f.name.split("-")[1].split(".")[0]) for f in files]
        self._flush_result = (seq, rows, None, files, rows_ref, flushed_seqs)

    def _adopt_flush(self, block: bool = False) -> None:
        """Publish a finished background flush: swap in the pre-merged hot cache,
        drop the flushed prefix of the RAM tier, unlink the flushed memory files.
        Driver thread only; O(swap + unlinks), the heavy work happened off-path."""
        fl = getattr(self, "_flush_inflight", None)
        if fl is None:
            return
        seq, th, n_tbls = fl
        if th.is_alive():
            if not block:
                return
            th.join()
        self._flush_inflight = None
        self._file_threads.pop(seq, None)  # joined ⇒ durable; commit-join also pops
        _seq, rows, merged, files, rows_ref, flushed_seqs = self._flush_result
        self._flush_result = None
        if rows is None:
            return
        if merged is not None:
            SNAP.adopt_cache(self.snapshot_store, merged)
        else:
            SNAP.drop_cache(self.snapshot_store)
        if rows_ref is not None and getattr(self, "_aug_actors", None):
            # fold the flushed rows into every augment shard's hot cache BEFORE any
            # post-adopt augment submission (per-caller actor ordering makes the
            # tier→storage boundary deterministic on each shard, as on the driver)
            for a in self._aug_actors:
                a.adopt_flush.remote(rows_ref, flushed_seqs)
        for f in files:
            f.unlink(missing_ok=True)
        if self._memory_tbls is not None:
            self._memory_tbls = self._memory_tbls[n_tbls:]
            self._memory_hashes = self._memory_hashes[n_tbls:]
            self._memory_meta = self._memory_meta[n_tbls:]
            self._memory_refs = self._memory_refs[n_tbls:]
        else:  # tier was flushed from files (resume path) — now empty
            self._memory_tbls, self._memory_hashes, self._memory_meta = [], [], []
            self._memory_refs = []

    def _flush_memory(self, seq: int) -> None:
        """Append memory files into the snapshot store's delta tier, then clear them
        (reference flush, AugmentedDiff.scala:226-233 — idempotent by flush seq).

        One sorted delta file per flush (LSM shape) instead of one file per touched
        partition — per-part appends cost thousands of small writes per interval at
        real churn — and the hot-store cache absorbs the rows in place instead of
        being invalidated and rescanned (a multi-second stall per flush)."""
        files = sorted(self.memory_root.glob("batch-*.parquet"))
        if not files:
            return
        if self._memory_tbls:  # in-RAM tier mirrors the files (appended in lockstep)
            rows = pa.concat_tables(self._memory_tbls, promote_options="default")
        else:
            rows = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default"
            )
        SNAP.append_delta(rows, self.snapshot_store, seq)
        for f in files:
            f.unlink()
        SNAP.append_to_cache(self.snapshot_store, rows)
        self._memory_tbls = []
        self._memory_hashes = []
        self._memory_meta = []
        self._memory_refs = []

    # -- graft outputs -------------------------------------------------------

    def _write_assignments(self, seq: int, keys_np, cells_np) -> None:
        _write_assignments_file(str(self.out / "assignments"), seq, keys_np, cells_np)

    def _write_knn(self, seq: int, t: pa.Table | None) -> None:
        _write_knn_file(str(self.out / "knn"), seq, t)

    def _write_overlay(self, seq: int, rows: list[dict]) -> None:
        _write_overlay_file(str(self.out / "overlay"), seq, rows)

    # -- stream --------------------------------------------------------------

    def run_stream(self, start: int = 1, end: int | None = None) -> dict:
        """Run batches [start, end]; committed batches are skipped (resume)."""
        if end is None:
            if self.osc_template is not None:
                raise ValueError(
                    "run_stream(end=None) cannot enumerate a templated OSC source — "
                    "pass an explicit end (reference --range semantics)"
                )
            # infer from world: count osc files
            osc_files = sorted((self.world / "changes").rglob("*.osc"))
            end = len(osc_files)
        done = self.lineage.completed()
        todo_all = [s for s in range(start, end + 1) if s not in done]
        self._stream_hint = len(todo_all)
        for s in todo_all[:3]:  # overlap the first parses with bootstrap/warm below
            self._prefetch_parse(s)
        self.bootstrap()
        self.warm()
        if self.store is None:
            self.store = IndexStore(self.index_root, num_shards=self.num_shards)
            self.store.start_pool()
        done = self.lineage.completed()
        stats = []
        # software pipeline: the driver's serial chain per batch is parse-get +
        # closure + state appends + two task submissions. Everything downstream —
        # augment semi-join (AugmentShard pool, up to P batches concurrent), render
        # fan-out, collect, emit/kNN/overlay tails — runs off-driver and overlaps
        # across the in-flight window (depth 3). At every pool width the critical
        # path is max(serial chain, parallel work / width), with the serial chain
        # now ~an order of magnitude below the r2 pre (whose driver-side augment was
        # the stream's Amdahl term). Lineage commits stay strictly ordered after each
        # batch's tail is durable; a kill simply recomputes the (≤4) uncommitted
        # batches (idempotent writes → byte-identical, tested).
        from collections import deque

        # in-flight window scales with the node width (like the pools): a wide
        # node's per-batch WORK shrinks with width but the per-batch LATENCY
        # (augment queue → render gather → kNN/overlay tails → commit) does not,
        # so a fixed depth caps throughput at depth/latency — the 32-CPU stream
        # sat latency-bound at ~depth·batch rate while its pools idled
        tails: deque = deque()  # pending collector finishes
        todo = [s for s in range(start, end + 1) if s not in done]
        depth = _stream_depth(len(todo))
        for s in todo[: depth + 1]:
            self._prefetch_parse(s)

        for i, seq in enumerate(todo):
            t_iter = time.perf_counter()
            if i + depth + 1 < len(todo):
                self._prefetch_parse(todo[i + depth + 1])
            pre = self._run_pre(seq, stream=True)
            tails.append(self._launch_collector(pre))
            if len(tails) > depth:
                _, p, f = tails.popleft()
                stats.append(self._finish_collector(p, f))
                stats[-1]["stage_sec"]["iter"] = round(time.perf_counter() - t_iter, 3)
        while tails:
            _, p, f = tails.popleft()
            stats.append(self._finish_collector(p, f))
        return {"batches": stats, "skipped": sorted(done - {0}), "end": end}

    def close(self) -> None:
        self._adopt_flush(block=True)  # finalize an un-published background flush
        for t in list(self._file_threads.values()):  # stragglers from aborted batches
            t.join()
        self._file_threads.clear()
        if self.store is not None:
            self.store.stop_pool()
            self.store = None
        if getattr(self, "_aug_actors", None):
            for a in self._aug_actors:
                ray.kill(a)
            self._aug_actors = None
        if getattr(self, "_pool_actors", None):
            for a in self._pool_actors:
                ray.kill(a)
            self._pool_actors = None
        if self._tiles is not None:
            self._tiles.close()
            self._tiles = None
        # a reused job must not hand tail tasks a cached ref to the killed pool
        self._tiles_ref = None


def run_stream(world_root: str, out_root: str, **kwargs) -> dict:
    """Convenience one-shot: bootstrap + full stream + close."""
    job = AdiffJob(world_root, out_root, **kwargs)
    try:
        return job.run_stream()
    finally:
        job.close()
