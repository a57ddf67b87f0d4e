"""Tile stages: PIP cell assignment, tile decode, kNN over neighbor cells, raster↔vector overlay.

The graft's spatial payload (north star): every decoded image tile and every reconstructed
way/relation geometry is assigned to its res-8 cell by **point-in-polygon** against the
cell polygons, served by a per-partition STRtree held in actor state; kNN looks up
neighboring tiles through the k-ring cell neighborhood; the overlay kernel rasterizes diff
geometries onto decoded tile pixels for diff rendering.

All stages are ``map_batches`` callables: plain functions where stateless, callable
classes (actor pools) where they hold state (STRtree per coarse partition, decoded-tile
scratch, neighbor index shards).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .. import cells as C
from .. import georef
from ..functions import geom as G
from ..functions import image as IMG
from ..state.strtree import STRtree


class CellAssigner:
    """Actor-pool stage: tile/point → res-8 cell via STRtree + PIP.

    Builds one STRtree per coarse parent cell lazily (cached per actor across batches):
    the tree holds that parent's res-``res`` child-cell rectangles; a query point walks
    the tree then confirms with an exact even-odd PIP against the cell polygon. For the
    rectangular cell scheme this equals the direct arithmetic ``cells.cell_of`` — the
    tests assert exactly that — but the machinery is the real one the north star names
    (and what a non-rectangular H3/S2 cell shape would need).
    """

    def __init__(self, res: int = C.DEFAULT_RES):
        self.res = res
        # one STRtree per parent 5 levels up ⇒ 32×64 = 2048 child boxes per tree
        self.COARSE_RES = max(0, res - 5)
        self._trees: dict[int, tuple[STRtree, np.ndarray]] = {}

    def _tree_for(self, parent_cell: int) -> tuple[STRtree, np.ndarray]:
        hit = self._trees.get(parent_cell)
        if hit is None:
            # enumerate the parent's descendant cells at self.res
            lat0, lat1, lon0, lon1 = (float(v) for v in C.cell_bounds(np.array([parent_cell])))
            eps = 1e-12
            kids = C.cells_covering_bbox(lat0 + eps, lat1 - eps, lon0 + eps, lon1 - eps, self.res)
            klat0, klat1, klon0, klon1 = C.cell_bounds(kids)
            boxes = np.stack([klon0, klat0, klon1, klat1], axis=1)
            hit = (STRtree(boxes), kids)
            self._trees[parent_cell] = hit
        return hit

    def assign_points(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Vectorized: arithmetic candidate cell for every point, then ONE batched
        ring-PIP per unique candidate cell confirms the assignment (the PIP machinery
        the north star names, amortized over the group instead of per point). The rare
        points whose candidate PIP fails (boundary sitters) fall back to the exact
        STRtree walk so the half-open convention matches the per-point path bit-for-bit.
        """
        out = np.full(len(lat), -1, dtype=np.int64)
        ok = ~(np.isnan(lat) | np.isnan(lon))
        if not ok.any():
            return out
        idx = np.nonzero(ok)[0]
        la, lo = lat[idx], lon[idx]
        cand = C.cell_of(la, lo, self.res)
        # one batched ring-PIP for ALL points at once, each against its own
        # candidate cell's ring (same vertex order as cell_polygon, bit-identical
        # kernel arithmetic) — the per-unique-cell loop ran one kernel call per
        # point when features spread across many cells
        lat0, lat1, lon0, lon1 = C.cell_bounds(cand)
        rings = np.empty((len(cand), 5, 2), np.float64)
        rings[:, 0, 0] = lon0
        rings[:, 0, 1] = lat0
        rings[:, 1, 0] = lon1
        rings[:, 1, 1] = lat0
        rings[:, 2, 0] = lon1
        rings[:, 2, 1] = lat1
        rings[:, 3, 0] = lon0
        rings[:, 3, 1] = lat1
        rings[:, 4] = rings[:, 0]
        confirmed = G.points_in_own_ring(lo, la, rings)
        out[idx[confirmed]] = cand[confirmed]

        # boundary fallback: the original per-point STRtree + PIP walk
        for j in np.nonzero(~confirmed)[0]:
            i, plat, plon = idx[j], la[j], lo[j]
            parent = int(C.cell_of(np.array([plat]), np.array([plon]), self.COARSE_RES)[0])
            tree, kids = self._tree_for(parent)
            cands = tree.query_point(plon, plat)
            for ci in cands:
                ring = C.cell_polygon(int(kids[ci]))
                if G.points_in_ring(np.array([plon]), np.array([plat]), ring)[0]:
                    out[i] = kids[ci]
                    break
            if out[i] == -1 and len(cands):  # boundary point: half-open convention
                out[i] = kids[cands[0]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Image batch → + ``cell`` column (centroid PIP assignment)."""
        lat, lon = georef.centroid(batch["phash"])
        cell = self.assign_points(lat, lon)
        if "cell" in batch.column_names:
            batch = batch.drop_columns(["cell"])
        return batch.append_column("cell", pa.array(cell))


def configured(cls, **kwargs):
    """Arg-free actor-class factory: bake constructor kwargs into a subclass so
    Ray Data's actor pool spawns it with NO constructor arguments. Constructor
    args travel via the object store and a restarted actor cannot replay them if
    the refs were lost (ray#53727 — the core-worker warning r2 flagged on the
    decode pool); a baked class has nothing to lose, so restarts are safe."""

    def __init__(self):
        cls.__init__(self, **kwargs)

    return type(f"{cls.__name__}Cfg", (cls,), {"__init__": __init__})


class TileDecoder:
    """Actor-pool stage: decode image ``bytes`` → per-tile stats + verification columns.

    Emits (image_id, cell, w, h, fmt, decode_ok, psnr_db, mean_lum, phash_check) without
    ever shipping pixel arrays through a shuffle — pixels live only inside the actor.

    ``TileDecoderFiles`` below is the direct-read variant: the work items are *file
    paths*, and each actor reads its file itself — blobs go storage→actor memory
    directly instead of read-task→object-store→actor (at 10s of GB the extra hop is a
    shared-bandwidth fixed cost that caps scaling on one node; on a cluster this is the
    locality-scheduling pattern).
    """

    def __init__(self, res: int = C.DEFAULT_RES, verify: bool = True, bank_rate: int = 0,
                 verify_rate: int = 1, feature_passes: int = 96):
        self.res = res
        self.verify = verify
        # verify_rate N > 1: PSNR-verify every Nth tile (deterministic by id hash) —
        # sampled verification for throughput runs; tests use full verification
        self.verify_rate = max(1, verify_rate)
        # feature_passes sizes the per-tile featurization compute — the stand-in for the
        # model-inference stage of a real multimodal pipeline (which costs 10-100ms/tile;
        # this kernel at default depth costs ~5-7ms and is cache-resident)
        self.feature_passes = feature_passes
        # bank_rate > 0: every bank_rate-th tile (by deterministic id hash) carries its
        # encoded bytes through in ``bank_bytes`` — the overlay sample bank, so the
        # diff-render stage never rescans the full image table
        self.bank_rate = bank_rate
        self.assigner = CellAssigner(res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        # zero-copy blob access: materializing ~25KB python bytes per row via to_pylist
        # causes allocator/page-fault contention that halves per-core throughput at high
        # actor counts — Arrow buffer views cost nothing
        barr = batch["bytes"].combine_chunks()
        blobs = [memoryview(barr[i].as_buffer()) for i in range(len(barr))]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        ok = np.zeros(len(ids), bool)
        psnr_db = np.full(len(ids), np.nan)
        mean_lum = np.full(len(ids), np.nan)
        feats = np.zeros((len(ids), 8), np.float32)
        for i, (iid, blob, fmt, w, h) in enumerate(zip(ids, blobs, fmts, ws, hs)):
            try:
                px, dec_fmt = IMG.decode(blob)
                ok[i] = dec_fmt == fmt and px.shape == (h, w, 3)
                mean_lum[i] = float(px.mean())
                feats[i] = IMG.tile_features(px, self.feature_passes)
                if self.verify and (
                    self.verify_rate == 1
                    or zlib.crc32(iid.encode()) % self.verify_rate == 0
                ):
                    # strip-fused reference+PSNR: L2-resident, no full-size temporaries
                    psnr_db[i] = IMG.psnr_vs_synth(iid, px)
            except Exception:
                ok[i] = False
        lat, lon = georef.centroid(batch["phash"])
        cell = self.assigner.assign_points(lat, lon)
        cols = {
            "image_id": batch["image_id"],
            "cell": pa.array(cell),
            "w": batch["w"],
            "h": batch["h"],
            "fmt": batch["fmt"],
            "caption": batch["caption"],
            "phash": batch["phash"],
            "decode_ok": pa.array(ok),
            "psnr_db": pa.array(psnr_db),
            "mean_lum": pa.array(mean_lum),
            "features": pa.array(list(feats), pa.list_(pa.float32(), 8)),
        }
        if self.bank_rate > 0:
            import zlib

            cols["bank_bytes"] = pa.array(
                [
                    bytes(blob) if zlib.crc32(iid.encode()) % self.bank_rate == 0 else None
                    for iid, blob in zip(ids, blobs)
                ],
                pa.binary(),
            )
        return pa.table(cols)


class TileDecoderFiles(TileDecoder):
    """Direct-read decode: batch rows are parquet file paths; the actor reads + decodes."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # batch: {'path': string}
        import pyarrow.parquet as pq

        tables = [pq.read_table(p) for p in batch["path"].to_pylist()]
        out = [TileDecoder.__call__(self, t) for t in tables if len(t)]
        if not out:
            raise ValueError("empty file batch")
        return pa.concat_tables(out, promote_options="default")


class TileDecoderFilesSink(TileDecoderFiles):
    """Resumable direct-read decode: each input file's decoded rows COMMIT as one
    ``part-<stem>.parquet`` under ``sink_dir`` via tmp+rename (dot-prefixed temp, so
    dataset readers never see a partial file). The task returns only a summary row —
    decoded rows go storage→actor→storage with no object-store hop either way. A
    restarted ingest skips inputs whose parts already exist
    (pipelines/indexer.py::assign_tiles): the north rule's "a killed run resumes
    without recomputing completed partitions", applied to the bootstrap's long pole.
    Decode is deterministic per file, so a resumed directory is byte-identical to a
    single-run one."""

    def __init__(self, sink_dir: str, **kw):
        super().__init__(**kw)
        from pathlib import Path as _Path

        self.sink_dir = _Path(sink_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:  # batch: {'path': string}
        import os
        from pathlib import Path as _Path

        import pyarrow.parquet as pq

        paths = batch["path"].to_pylist()
        n_rows = []
        for p in paths:
            t = pq.read_table(p)
            if not len(t):
                n_rows.append(0)
                continue
            dec = TileDecoder.__call__(self, t)
            stem = _Path(p).stem
            tmp = self.sink_dir / f".tmp-part-{stem}.parquet"
            pq.write_table(dec, tmp)
            os.replace(tmp, self.sink_dir / f"part-{stem}.parquet")
            n_rows.append(len(dec))
        return pa.table(
            {"path": pa.array(paths, pa.string()), "rows": pa.array(n_rows, pa.int64())}
        )


class TileResizer:
    """Actor-pool stage: decode → bilinear resize → re-encode (the multimodal "resize"
    op). Same layout contract as TileDecoder: pixels exist only inside the actor; the
    output row carries the resized OPAQUE blob + typed metadata (image_id, out_w,
    out_h, fmt, n_bytes), so downstream stages shuffle thumbnails, never rasters."""

    def __init__(self, out_w: int = 16, out_h: int = 16, fmt: str = "rawz"):
        self.out_w = out_w
        self.out_h = out_h
        self.fmt = fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        barr = batch["bytes"].combine_chunks()
        blobs = [memoryview(barr[i].as_buffer()) for i in range(len(barr))]
        out_bytes, ok = [], np.zeros(len(blobs), bool)
        for i, blob in enumerate(blobs):
            try:
                px, _ = IMG.decode(blob)
                small = IMG.resize_bilinear(px, self.out_h, self.out_w)
                out_bytes.append(IMG.encode(small, self.fmt))
                ok[i] = True
            except Exception:
                out_bytes.append(b"")
        return pa.table(
            {
                "image_id": batch["image_id"],
                "out_w": pa.array(np.full(len(blobs), self.out_w, np.int32)),
                "out_h": pa.array(np.full(len(blobs), self.out_h, np.int32)),
                "fmt": pa.array([self.fmt] * len(blobs), pa.string()),
                "resize_ok": pa.array(ok),
                "n_bytes": pa.array([len(b) for b in out_bytes], pa.int64()),
                "bytes": pa.array(out_bytes, pa.binary()),
            }
        )


class FrameSampler:
    """Actor-pool stage: multi-frame blob → decode ONLY k uniformly-sampled frames
    (the multimodal "frame-sample" op). The ADV1 index header makes the non-sampled
    frames free — a sampler never inflates them (IMG.frame_slice is a seek+slice).
    Emits one row per sampled frame: (image_id, frame_idx, n_frames, w, h, psnr_db)
    with the per-frame verify against the deterministic source."""

    def __init__(self, k: int = 3, verify: bool = True):
        self.k = k
        self.verify = verify

    def __call__(self, batch: pa.Table) -> pa.Table:
        barr = batch["video"].combine_chunks()
        ids = batch["image_id"].to_pylist()
        out_id, out_fi, out_nf, out_w, out_h, out_psnr = [], [], [], [], [], []
        for row, iid in enumerate(ids):
            blob = memoryview(barr[row].as_buffer())
            nf = IMG.frame_count(blob)
            for fi in IMG.sample_frame_indices(nf, self.k):
                px, _ = IMG.decode(IMG.frame_slice(blob, int(fi)))  # zero-copy slices
                out_id.append(iid)
                out_fi.append(int(fi))
                out_nf.append(nf)
                out_h.append(px.shape[0])
                out_w.append(px.shape[1])
                out_psnr.append(
                    IMG.psnr_vs_synth(f"{iid}#f{int(fi)}", px) if self.verify else np.nan
                )
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "frame_idx": pa.array(out_fi, pa.int64()),
                "n_frames": pa.array(out_nf, pa.int64()),
                "w": pa.array(out_w, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "psnr_db": pa.array(out_psnr, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# kNN over neighboring cells
# ---------------------------------------------------------------------------


def _id_pad(dtype: np.dtype):
    """Padding value for unfilled top-k slots: '' for string ids, -1 for the
    numeric-id fast path (fixed-width ids sort identically as ints — see
    TileShard). Padding never reaches output rows (inf-dist rows are dropped)."""
    return "" if dtype.kind == "U" else -1


def topk_per_query(
    qidx: np.ndarray, dist: np.ndarray, ids: np.ndarray, n_queries: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Flat (query_idx, dist, id) candidate triples → dense (Q, k) top-k arrays,
    inf/pad-filled, ties broken by id. One lexsort — no per-query Python loop. The
    shared segment-top-k kernel for the ring path, the brute path and the shard
    merge. ``ids`` may be strings or (fixed-width-equivalent) int64."""
    width = ids.dtype if ids.dtype.kind != "U" or ids.dtype.itemsize else np.dtype("U32")
    out_ids = np.full((n_queries, k), _id_pad(ids.dtype), dtype=width)
    out_dist = np.full((n_queries, k), np.inf)
    # padding rows (inf dist) can never be selected — drop them BEFORE sorting
    # (shard merges arrive inf-padded to k per shard; the padding dominated the
    # sort input and tied with itself)
    fin = np.isfinite(dist)
    if not fin.all():
        qidx, dist, ids = qidx[fin], dist[fin], ids[fin]
    if len(qidx) == 0:
        return out_ids, out_dist
    # numeric-first sort; the id STRING key participates only where an exact
    # (query, dist) tie needs breaking — a full string lexsort over the merge
    # (≈ Q·k·shards U32 rows per stream batch) was the kNN tail's hidden cost
    o = np.lexsort((dist, qidx))
    qs0, ds0 = qidx[o], dist[o]
    tie_pair = (qs0[1:] == qs0[:-1]) & (ds0[1:] == ds0[:-1])
    if tie_pair.any():
        memb = np.zeros(len(o), bool)
        ti = np.flatnonzero(tie_pair)
        memb[ti] = True
        memb[ti + 1] = True
        mi = np.flatnonzero(memb)
        new_run = np.r_[
            True,
            (mi[1:] != mi[:-1] + 1)
            | (qs0[mi][1:] != qs0[mi][:-1])
            | (ds0[mi][1:] != ds0[mi][:-1]),
        ]
        lbl = np.cumsum(new_run)
        sub = np.lexsort((ids[o[mi]], lbl))
        o[mi] = o[mi][sub]
    qs = qidx[o]
    first = np.r_[True, qs[1:] != qs[:-1]]
    starts = np.flatnonzero(first)
    lens = np.diff(np.r_[starts, len(qs)])
    pos = np.arange(len(qs)) - np.repeat(starts, lens)
    m = pos < k
    out_ids[qs[m], pos[m]] = ids[o][m]
    out_dist[qs[m], pos[m]] = dist[o][m]
    return out_ids, out_dist


def _ring_bounds(
    qrow: np.ndarray, qcol: np.ndarray, sc: np.ndarray, r: int, res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query (lo, hi) searchsorted bounds of every ring strip, (A, S) each.

    Enumerates ROW STRIPS, not cells: within one row the ring's columns are a contiguous
    cell-id range, so each strip costs two searchsorteds — (2r+1) strips per query
    instead of (2r+1)² cells (the difference between 129 and 16k probes at r=64).
    Column wraparound adds a second strip set; out-of-range rows are masked out.
    Candidate COUNTS are ``maximum(hi - lo, 0).sum(1)`` — available without gathering,
    which is what lets the caller chunk by candidate mass instead of query count.
    """
    nrows, ncols = C.grid_shape(res)
    A = len(qrow)
    offs = np.arange(-r, r + 1)
    rows = qrow[:, None] + offs[None, :]                     # (A, S)
    row_ok = (rows >= 0) & (rows < nrows)
    c_lo, c_hi = qcol - r, qcol + r                          # may under/overflow
    full_span = (c_hi - c_lo + 1) >= ncols

    def _strip(lo_col: np.ndarray, hi_col: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Inclusive column range per query → (lo, hi) flat searchsorted bounds (A·S)."""
        ok = row_ok & (hi_col >= lo_col)[:, None]
        base = C.make_cell(np.int64(res), np.where(row_ok, rows, 0), 0)
        lo = np.where(ok, base + lo_col[:, None], np.int64(-2))
        hi = np.where(ok, base + hi_col[:, None], np.int64(-3))
        return (
            np.searchsorted(sc, lo.ravel(), side="left"),
            np.searchsorted(sc, hi.ravel(), side="right"),
        )

    # main strip: [max(c_lo,0) .. min(c_hi, ncols-1)]; wrap strips for the overflow
    m_lo = np.where(full_span, 0, np.maximum(c_lo, 0))
    m_hi = np.where(full_span, ncols - 1, np.minimum(c_hi, ncols - 1))
    strips = [_strip(m_lo, m_hi)]
    if (c_lo < 0).any() and not full_span.all():
        w_lo = np.where((c_lo < 0) & ~full_span, c_lo + ncols, 1)
        w_hi = np.where((c_lo < 0) & ~full_span, ncols - 1, 0)
        strips.append(_strip(w_lo, w_hi))
    if (c_hi >= ncols).any() and not full_span.all():
        w_lo = np.where((c_hi >= ncols) & ~full_span, 0, 1)
        w_hi = np.where((c_hi >= ncols) & ~full_span, c_hi - ncols, 0)
        strips.append(_strip(w_lo, w_hi))

    lo = np.concatenate([s[0].reshape(A, -1) for s in strips], axis=1)
    hi = np.concatenate([s[1].reshape(A, -1) for s in strips], axis=1)
    return lo, hi


def _ring_candidates(
    qrow: np.ndarray, qcol: np.ndarray, sc: np.ndarray, order: np.ndarray,
    r: int, res: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (2r+1)²-ring candidate gather for A queries against cell-sorted tiles:
    returns (flat tile indices, per-query candidate counts, flat query positions).
    Strip enumeration in :func:`_ring_bounds`."""
    A = len(qrow)
    lo, hi = _ring_bounds(qrow, qcol, sc, r, res)
    lens = np.maximum(hi - lo, 0)
    counts = lens.sum(axis=1)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), counts, np.empty(0, np.int64)
    lens_f = lens.ravel()
    rep_start = np.repeat(lo.ravel(), lens_f)
    within = np.arange(total) - np.repeat(np.cumsum(lens_f) - lens_f, lens_f)
    cand = order[rep_start + within]
    qpos = np.repeat(np.arange(A), counts)
    return cand, counts, qpos


def _chunk_flood_topk(
    cand: np.ndarray, cnts: np.ndarray, qpos: np.ndarray, aq: np.ndarray,
    query_lat: np.ndarray, query_lon: np.ndarray, cos_lat: np.ndarray,
    tile_lat: np.ndarray, tile_lon: np.ndarray, id_rank: np.ndarray, kk: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact per-query top-kk over one gathered candidate flood; returns the
    selected (query position, rank, tile index, squared distance) quadruple.

    Distances are exact float64 throughout — computed ONCE, shared by the
    prefilter and the final selection (an earlier float32 shadow-coordinate
    prefilter was unsound: casting absolute lat/lon to float32 costs ~1 m of
    ABSOLUTE distance error at mid/large coordinates — ulp(120°) ≈ 1e-5° — so
    a relative guard band pruned true near-tie contenders).

    The partition-prefilter before the (n log n, 3-key) lexsort keeps only
    candidates with d2 ≤ the query's kk-th smallest EXACT d2 (ties included by
    the ≤ — the id_rank tie-break still sees every tied contender, so the
    output is exactly the full-sort result). At ~20 tiles/cell density a k=3
    ring-1 query carries ~190 candidates, and the full 3-key sort over the
    flood was the serving pool's dominant kernel cost. Dense (A, maxc) padding
    is linear; guarded against skew (a metro cell blowing maxc) by falling
    back to the full sort."""
    dlat = (tile_lat[cand] - query_lat[aq]) * 111_320.0
    dlon = (tile_lon[cand] - query_lon[aq]) * 111_320.0 * cos_lat[aq]
    d2 = dlat * dlat + dlon * dlon  # squared (monotone) — sqrt only the k
    maxc = int(cnts.max())
    A_sub = len(cnts)
    if maxc > kk and A_sub * maxc <= (1 << 23):
        starts_g = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        pos_in = np.arange(len(cand)) - np.repeat(starts_g, cnts)
        dd = np.full((A_sub, maxc), np.inf)
        dd[qpos, pos_in] = d2
        thr = np.partition(dd, kk - 1, axis=1)[:, kk - 1]
        keep_m = d2 <= thr[qpos]
        cand = cand[keep_m]
        qpos = qpos[keep_m]
        d2 = d2[keep_m]
    o = np.lexsort((id_rank[cand], d2, qpos))  # qpos presorted → cheap
    qs = qpos[o]
    first = np.r_[True, qs[1:] != qs[:-1]]
    starts = np.flatnonzero(first)
    lens = np.diff(np.r_[starts, len(qs)])
    pos = np.arange(len(qs)) - np.repeat(starts, lens)
    m = pos < kk
    return qs[m], pos[m], cand[o][m], d2[o][m]


def _quad_geometry(
    query_lat: np.ndarray, query_lon: np.ndarray, res: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-query leaning 2×2 block: (first row, first col, fy, fx).

    The block is the query's own cell plus the row/column neighbor on the side
    the query point leans toward (fractional position ≥ 0.5). Rows outside the
    grid are clamped away by the bounds machinery (no tiles exist beyond the
    grid edge, so the lost half never hides a candidate); columns wrap."""
    nrows, ncols = C.grid_shape(res)
    y = np.nan_to_num((np.asarray(query_lat, np.float64) + 90.0) / 180.0 * nrows)
    x = np.nan_to_num((np.asarray(query_lon, np.float64) + 180.0) / 360.0 * ncols)
    row = np.clip(np.floor(y).astype(np.int64), 0, nrows - 1)
    col_raw = np.floor(x).astype(np.int64)
    fy = np.clip(y - row, 0.0, 1.0)
    fx = x - col_raw
    col = np.mod(col_raw, ncols)
    qrow0 = row - 1 + (fy >= 0.5)
    c_lo = col - 1 + (fx >= 0.5)  # in [-1, ncols-1]; c_hi = c_lo + 1
    return qrow0, c_lo, fy, fx


def quad_coverage_m(
    query_lat: np.ndarray, query_lon: np.ndarray, res: int = C.DEFAULT_RES,
) -> np.ndarray:
    """Guaranteed-coverage radius (metres) of the leaning 2×2 block: the
    distance from the query point to the nearest block boundary is
    max(f, 1−f) ≥ 0.5 cell per axis (the block extends toward the side the
    point leans to). A query whose k-th candidate distance is ≤ this radius is
    EXACT — no closer tile can exist outside the searched block. Grid-edge
    clamping only widens the bound (nothing exists beyond the edge, and the
    formula's min already comes from the in-grid side)."""
    nrows, ncols = C.grid_shape(res)
    _, _, fy, fx = _quad_geometry(query_lat, query_lon, res)
    cell_h_m = 180.0 / nrows * 111_320.0
    cos_lat = np.cos(np.radians(np.nan_to_num(query_lat)))
    cell_w_m = 360.0 / ncols * 111_320.0 * cos_lat
    return np.minimum(
        np.maximum(fy, 1.0 - fy) * cell_h_m,
        np.maximum(fx, 1.0 - fx) * cell_w_m,
    )


def _block_bounds(
    qrow0: np.ndarray, c_lo: np.ndarray, sc: np.ndarray, res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query (lo, hi) searchsorted bounds of the 2-row × 2-col leaning
    block — the quadrant analogue of :func:`_ring_bounds` (same strip
    enumeration: one contiguous cell-id range per in-grid row, wrap strips for
    columns crossing the antimeridian)."""
    nrows, ncols = C.grid_shape(res)
    A = len(qrow0)
    rows = qrow0[:, None] + np.arange(2)[None, :]            # (A, 2)
    row_ok = (rows >= 0) & (rows < nrows)
    c_hi = c_lo + 1                                          # may be ncols

    def _strip(lo_col: np.ndarray, hi_col: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ok = row_ok & (hi_col >= lo_col)[:, None]
        base = C.make_cell(np.int64(res), np.where(row_ok, rows, 0), 0)
        lo = np.where(ok, base + lo_col[:, None], np.int64(-2))
        hi = np.where(ok, base + hi_col[:, None], np.int64(-3))
        return (
            np.searchsorted(sc, lo.ravel(), side="left"),
            np.searchsorted(sc, hi.ravel(), side="right"),
        )

    strips = [_strip(np.maximum(c_lo, 0), np.minimum(c_hi, ncols - 1))]
    if (c_lo < 0).any():
        strips.append(_strip(
            np.where(c_lo < 0, np.int64(ncols - 1), np.int64(1)),
            np.where(c_lo < 0, np.int64(ncols - 1), np.int64(0)),
        ))
    if (c_hi >= ncols).any():
        strips.append(_strip(
            np.where(c_hi >= ncols, np.int64(0), np.int64(1)),
            np.where(c_hi >= ncols, np.int64(0), np.int64(0)),
        ))
    lo = np.concatenate([s[0].reshape(A, -1) for s in strips], axis=1)
    hi = np.concatenate([s[1].reshape(A, -1) for s in strips], axis=1)
    return lo, hi


def _block_candidates(
    qrow0: np.ndarray, c_lo: np.ndarray, sc: np.ndarray, order: np.ndarray,
    res: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Candidate gather over the leaning 2×2 block (same flat layout as
    :func:`_ring_candidates`)."""
    A = len(qrow0)
    lo, hi = _block_bounds(qrow0, c_lo, sc, res)
    lens = np.maximum(hi - lo, 0)
    counts = lens.sum(axis=1)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), counts, np.empty(0, np.int64)
    lens_f = lens.ravel()
    rep_start = np.repeat(lo.ravel(), lens_f)
    within = np.arange(total) - np.repeat(np.cumsum(lens_f) - lens_f, lens_f)
    cand = order[rep_start + within]
    qpos = np.repeat(np.arange(A), counts)
    return cand, counts, qpos


def knn_quad_arrays(
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    tile_cells: np.ndarray,
    tile_lat: np.ndarray,
    tile_lon: np.ndarray,
    tile_ids: np.ndarray,
    k: int = 3,
    res: int = C.DEFAULT_RES,
    prep: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k among the tiles of the query's leaning 2×2 cell block — the
    serving pool's round-0 kernel. The block (own cell + the row/col neighbor
    the point leans toward) holds ~4/9 of the ring-1 candidate flood, and by
    :func:`quad_coverage_m` its result is EXACT for any query whose k-th
    distance fits inside max(f, 1−f) × cell dimension — at uniform density d
    the k-th neighbor sits at ~sqrt(k/(πd)) cells, so for d ≳ 4k nearly every
    query resolves in this round and never pays the full ring.

    Returns dense (Q, k) (ids ''/-1-padded, dist inf-padded), ties by id —
    identical layout and tie discipline to :func:`knn_arrays`. CONTRACT: rows
    are exact top-k only for queries whose k-th distance ≤
    :func:`quad_coverage_m` (the caller's resolve test); other rows may be
    truncated — the flood is pruned at the coverage radius BEFORE the sort
    (candidates beyond it can never appear in an exactly-resolved answer), so
    a query the block can't prove exact pads to inf and stays active for the
    ring rounds, which recompute it from scratch."""
    tile_ids = np.asarray(tile_ids)
    Q, n = len(query_lat), len(tile_ids)
    kk = max(1, min(k, n)) if n else 1
    if n == 0 or Q == 0:
        return topk_per_query(np.empty(0, np.int64), np.empty(0), tile_ids[:1], Q, kk)
    if prep is not None:
        order, sc, id_rank = prep
    else:
        order, sc, id_rank = knn_prep(tile_cells, tile_ids)
    qrow0, c_lo, _, _ = _quad_geometry(query_lat, query_lon, res)
    cos_lat = np.cos(np.radians(np.nan_to_num(query_lat)))
    bad = np.isnan(query_lat) | np.isnan(query_lon)
    active = np.flatnonzero(~bad)
    out_ids = np.full((Q, kk), _id_pad(tile_ids.dtype), dtype=tile_ids.dtype)
    out_dist = np.full((Q, kk), np.inf)
    A = len(active)
    if A == 0:
        return out_ids, out_dist
    # coverage-radius² keep threshold, inflated by 3 ulps so a candidate whose
    # ROUNDED sqrt(d2) lands exactly on the coverage radius is never dropped
    # (the resolve test compares sqrt(d2) ≤ cov; keeping extra candidates is
    # always sound — they're legitimate block members)
    cov = quad_coverage_m(query_lat, query_lon, res)
    cov2 = cov * cov * (1.0 + 1e-12)
    idx_a = np.full((A, kk), -1, np.int64)
    d2_a = np.full((A, kk), np.inf)
    # chunk by exact candidate mass (metro-skew guard — same rationale as the
    # ring kernel's loop); counts come from strip searchsorteds, no gather
    lo_b, hi_b = _block_bounds(qrow0[active], c_lo[active], sc, res)
    cnt_all = np.maximum(hi_b - lo_b, 0).sum(axis=1)
    cum = np.cumsum(cnt_all)
    cap = 1 << 21
    chunk_starts = [0]
    while True:
        s = chunk_starts[-1]
        e = int(np.searchsorted(cum, (cum[s - 1] if s else 0) + cap, "right"))
        e = max(e, s + 1)
        if e >= A:
            break
        chunk_starts.append(e)
    bounds = chunk_starts + [A]
    for ci in range(len(chunk_starts)):
        s0, s1 = bounds[ci], bounds[ci + 1]
        sub = active[s0:s1]
        cand, cnts, qpos = _block_candidates(qrow0[sub], c_lo[sub], sc, order, res)
        if not len(cand):
            continue
        aq = sub[qpos]
        dlat = (tile_lat[cand] - query_lat[aq]) * 111_320.0
        dlon = (tile_lon[cand] - query_lon[aq]) * 111_320.0 * cos_lat[aq]
        d2 = dlat * dlat + dlon * dlon
        keep = d2 <= cov2[aq]  # coverage prune: no dense pad, no partition
        cand, qpos, d2 = cand[keep], qpos[keep], d2[keep]
        if not len(cand):
            continue
        # 2-key sort + tie repair: np.lexsort pays a full stable argsort PER
        # key, and exact float-distance ties are rare — sort (d2, qpos), then
        # re-order only the tied runs by id_rank (the rows sit in exactly the
        # right slots already, so writing the globally-(qpos,d2,id_rank)-sorted
        # tied rows back into those slots restores the full 3-key order)
        o = np.lexsort((d2, qpos))
        d2s, qss = d2[o], qpos[o]
        tie = (d2s[1:] == d2s[:-1]) & (qss[1:] == qss[:-1])
        if tie.any():
            tr = np.flatnonzero(np.r_[False, tie] | np.r_[tie, False])
            sub_o = o[tr]
            oo = np.lexsort((id_rank[cand[sub_o]], d2[sub_o], qpos[sub_o]))
            o[tr] = sub_o[oo]
        qs = qpos[o]
        first = np.r_[True, qs[1:] != qs[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(qs)])
        pos = np.arange(len(qs)) - np.repeat(starts, lens)
        m = pos < kk
        idx_a[qs[m] + s0, pos[m]] = cand[o][m]
        d2_a[qs[m] + s0, pos[m]] = d2[o][m]
    good = idx_a >= 0
    ids_sel = np.full(idx_a.shape, _id_pad(tile_ids.dtype), dtype=tile_ids.dtype)
    if good.any():
        ids_sel[good] = tile_ids[idx_a[good]]
    out_ids[active] = ids_sel
    out_dist[active] = np.sqrt(d2_a)
    return out_ids, out_dist


def knn_prep(tile_cells: np.ndarray, tile_ids: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cell argsort order, sorted cells, id tie-break rank) for :func:`knn_arrays` —
    build once per static tile set. id-RANK keeps the candidate flood pure int/float:
    gathering + lexsorting the U32 id strings themselves cost ~GB of copies and a
    string sort per call (measured 14 s for 43k queries against a 131k-tile shard;
    ints+floats: ~2 s). Rank order == id order, so (dist, id) tie-break is
    bit-identical."""
    tile_ids = np.asarray(tile_ids)
    order = np.argsort(tile_cells, kind="stable")
    sc = tile_cells[order]
    id_rank = np.empty(len(tile_ids), np.int64)
    id_rank[np.argsort(tile_ids, kind="stable")] = np.arange(len(tile_ids))
    return order, sc, id_rank


def knn_arrays(
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    tile_cells: np.ndarray,
    tile_lat: np.ndarray,
    tile_lon: np.ndarray,
    tile_ids: np.ndarray,
    k: int = 5,
    ring: int = 1,
    res: int = C.DEFAULT_RES,
    expand: bool = False,
    prep: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """For each query point: the k nearest tiles among those whose cell lies in the
    query cell's (2·ring+1)² k-ring — the cell index prunes the candidate set.

    ``expand=True`` doubles the ring (up to 64×) until ≥k candidates appear — the
    sparse-region ANN behavior; fixed-ring keeps the SQL-expressible semantics for the
    conformance oracle. When the tile set is small (≤ ``brute_threshold``) and expansion
    is on, a vectorized brute-force pass beats the ring machinery — the same
    plan-by-size adaptivity as the closure. Distance: equirect meters-ish (in-ring OK).

    Returns dense (Q, k) arrays (image_id ''-padded, dist inf-padded), ties by id —
    the whole path is numpy; nothing iterates queries in Python.

    With ``expand=True`` the result is EXACT kNN: a query is only resolved once its
    k-th candidate distance fits inside the ring's guaranteed coverage radius
    (r × min cell dimension), so no closer tile can exist outside the examined ring.
    The brute path is therefore a pure work heuristic (Q·n small), never a semantics
    switch.
    """
    tile_ids = np.asarray(tile_ids)
    Q, n = len(query_lat), len(tile_ids)
    kk = max(1, min(k, n)) if n else 1
    if n == 0:
        return topk_per_query(np.empty(0, np.int64), np.empty(0), tile_ids[:0], Q, kk)
    if expand and Q * n <= 1 << 22:  # ≤ ~4M pairwise dists: one matmul-ish pass wins
        return _knn_brute_arrays(query_lat, query_lon, tile_lat, tile_lon, tile_ids, k)
    if prep is not None:
        # static tile sets (the serving shards) pass (order, sc, id_rank) built ONCE —
        # re-deriving them costs a 131k argsort + a U32 string argsort per CALL
        order, sc, id_rank = prep
    else:
        order, sc, id_rank = knn_prep(tile_cells, tile_ids)
    qcells = C.cell_of(query_lat, query_lon, res)
    qrow_all, qcol_all = C.cell_row(qcells), C.cell_col(qcells)
    nrows, ncols = C.grid_shape(res)
    cell_h_m = 180.0 / nrows * 111_320.0
    cos_lat = np.cos(np.radians(np.nan_to_num(query_lat)))
    cell_min_m = np.minimum(cell_h_m, 360.0 / ncols * 111_320.0 * cos_lat)

    out_ids = np.full((Q, kk), _id_pad(tile_ids.dtype), dtype=tile_ids.dtype)
    out_dist = np.full((Q, kk), np.inf)
    active = np.flatnonzero(qcells >= 0)
    r = ring
    if expand:
        # density-informed start: at expected density d (tiles per cell over the
        # occupied bbox) a ring needs (2r+1)² · d ≳ 4k candidates — starting there
        # skips the guaranteed-empty first doublings in sparse shards
        rows_span = int(C.cell_row(sc[-1]) - C.cell_row(sc[0]) + 1) if n else 1
        occ = np.unique(sc)
        cols_span = max(
            1, int(np.ptp(C.cell_col(occ)) + 1) if len(occ) else 1
        )
        dens = n / max(rows_span * cols_span, 1)
        r = max(ring, int(np.ceil((np.sqrt(4.0 * k / max(dens, 1e-9)) - 1) / 2)))
        r = min(r, 64)
    while len(active):
        A = len(active)
        idx_a = np.full((A, kk), -1, np.int64)
        d2_a = np.full((A, kk), np.inf)
        counts = np.zeros(A, np.int64)
        # chunk queries by EXACT candidate mass so the flood (rows × several
        # arrays) stays small enough for the allocator's arena to REUSE — one
        # monolithic gather mallocs tens of MB of fresh (mmap'd, OS-returned)
        # pages per call, which is the slow path on memory-pressured hosts.
        # Mass, not query count: the old average-density sizing melted down on
        # skewed worlds — one metro cell holding 1000x the mean density turned a
        # 4.7k-query chunk into a 750M-row gather (35 GB arena, minutes of
        # lexsort); exact per-query ring counts are just strip searchsorteds,
        # no gather, computed in bounded blocks.
        cnt_all = np.empty(A, np.int64)
        S = 2 * r + 1
        bq = max(1, (1 << 22) // max(S, 1))  # bounds block: A_blk × S ints ≤ ~4M
        for b0 in range(0, A, bq):
            sub_b = active[b0 : b0 + bq]
            lo_b, hi_b = _ring_bounds(qrow_all[sub_b], qcol_all[sub_b], sc, r, res)
            cnt_all[b0 : b0 + len(sub_b)] = np.maximum(hi_b - lo_b, 0).sum(axis=1)
        cum = np.cumsum(cnt_all)
        cap = 1 << 21
        chunk_starts = [0]
        while True:
            s = chunk_starts[-1]
            e = int(np.searchsorted(cum, (cum[s - 1] if s else 0) + cap, "right"))
            e = max(e, s + 1)
            if e >= A:
                break
            chunk_starts.append(e)
        bounds = chunk_starts + [A]
        for ci in range(len(chunk_starts)):
            s0, s1 = bounds[ci], bounds[ci + 1]
            sub = active[s0:s1]
            cand, cnts, qpos = _ring_candidates(
                qrow_all[sub], qcol_all[sub], sc, order, r, res
            )
            counts[s0 : s0 + len(sub)] = cnts
            aq = sub[qpos]
            if len(cand):
                qs_m, pos_m, cand_m, d2_m = _chunk_flood_topk(
                    cand, cnts, qpos, aq, query_lat, query_lon, cos_lat,
                    tile_lat, tile_lon, id_rank, kk,
                )
                idx_a[qs_m + s0, pos_m] = cand_m
                d2_a[qs_m + s0, pos_m] = d2_m
        dist_a = np.sqrt(d2_a)
        if not expand or r >= 64:
            done = np.ones(A, bool)
        else:
            kth = dist_a[:, kk - 1]
            done = ((counts >= kk) & (kth <= r * cell_min_m[active])) | (counts >= n)
        da = np.flatnonzero(done)
        sel = idx_a[da]
        good = sel >= 0
        ids_sel = np.full(sel.shape, _id_pad(tile_ids.dtype), dtype=tile_ids.dtype)
        if good.any():
            ids_sel[good] = tile_ids[sel[good]]
        out_ids[active[da]] = ids_sel
        out_dist[active[da]] = dist_a[da]
        active = active[~done]
        r *= 2
    return out_ids, out_dist


def _knn_brute_arrays(
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    tile_lat: np.ndarray,
    tile_lon: np.ndarray,
    tile_ids: np.ndarray,
    k: int,
    chunk: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized all-pairs top-k, chunked over queries (small tile sets). Partitions
    on SQUARED distance (monotone — saves the hypot pass over Q×n), sqrt only the
    selected k; small chunks keep the distance matrix L2-resident."""
    Q, n = len(query_lat), len(tile_ids)
    kk = max(1, min(k, n)) if n else 1
    if n == 0 or Q == 0:
        return topk_per_query(np.empty(0, np.int64), np.empty(0), tile_ids[:1], Q, kk)
    qs: list[np.ndarray] = []
    ds: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    for s in range(0, Q, chunk):
        qla = query_lat[s : s + chunk, None]
        qlo = query_lon[s : s + chunk, None]
        good = ~(np.isnan(qla[:, 0]) | np.isnan(qlo[:, 0]))
        dlat = (tile_lat[None, :] - qla) * 111_320.0
        dlon = (tile_lon[None, :] - qlo) * (111_320.0 * np.cos(np.radians(np.nan_to_num(qla))))
        dlat *= dlat
        dlon *= dlon
        dlat += dlon
        d2 = dlat
        m = d2.shape[0]
        if kk < n:
            # ties-exact selection: argpartition alone picks an ARBITRARY subset of
            # candidates tied at the k-th distance, breaking the (dist, id) contract
            # (caught by the ring-vs-brute equivalence test with duplicated
            # positions). Take everything ≤ the k-th value — the final
            # topk_per_query orders ties by id and trims back to k.
            kth = np.partition(d2, kk - 1, axis=1)[:, kk - 1 : kk]
            rows, cols = np.nonzero(d2 <= kth)
            qs.append((rows + s)[good[rows]])
            ds.append(np.sqrt(d2[rows, cols][good[rows]]))
            cs.append(cols[good[rows]])
        else:
            part = np.broadcast_to(np.arange(n), (m, n))
            qs.append((np.repeat(np.arange(m) + s, n))[np.repeat(good, n)])
            ds.append(np.sqrt(np.take_along_axis(d2, part, axis=1)[good].ravel()))
            cs.append(part[good].ravel())
    qidx = np.concatenate(qs)
    return topk_per_query(
        qidx, np.concatenate(ds), tile_ids[np.concatenate(cs)], Q, kk
    )


def knn_against_tiles(
    query_lat: np.ndarray,
    query_lon: np.ndarray,
    tile_cells: np.ndarray,
    tile_lat: np.ndarray,
    tile_lon: np.ndarray,
    tile_ids: list[str],
    k: int = 5,
    ring: int = 1,
    res: int = C.DEFAULT_RES,
    expand: bool = False,
) -> list[list[tuple[str, float]]]:
    """List-of-tuples view of :func:`knn_arrays` (tests + SQL-oracle paths; the stream
    uses the array form end-to-end)."""
    ids, dist = knn_arrays(
        query_lat, query_lon, tile_cells, tile_lat, tile_lon,
        np.asarray(tile_ids), k=k, ring=ring, res=res, expand=expand,
    )
    fin = np.isfinite(dist)
    return [
        [(str(ids[i, j]), float(dist[i, j])) for j in np.flatnonzero(fin[i])]
        for i in range(len(ids))
    ]


# ---------------------------------------------------------------------------
# raster ↔ vector overlay
# ---------------------------------------------------------------------------


def geom_tile_mask(
    h: int,
    w: int,
    bbox: tuple[float, float, float, float],
    geom,
) -> np.ndarray:
    """Rasterize one diff geometry to an (h, w) bool pixel mask.

    bbox = (lat0, lat1, lon0, lon1) tile footprint. Polygons fill by per-pixel PIP
    (vectorized even-odd, clipped to the polygon-bbox subgrid); points/lines mark a
    small neighborhood of their vertices. Split out of the blend so a tile hit by many
    geometries pays ONE blend pass, not one full-image float pass per geometry.
    """
    lat0, lat1, lon0, lon1 = bbox
    spanx = max(lon1 - lon0, 1e-12)
    spany = max(lat1 - lat0, 1e-12)
    ys = lat1 - (np.arange(h) + 0.5) / h * (lat1 - lat0)  # row 0 = north
    xs = lon0 + (np.arange(w) + 0.5) / w * (lon1 - lon0)
    mask = np.zeros((h, w), bool)

    def _mark_points(coords: np.ndarray, radius: int = 1):
        coords = coords[~np.isnan(coords).any(axis=1)]
        # only points inside (a slightly padded) tile bbox can paint pixels
        pad_x, pad_y = spanx * 0.05, spany * 0.05
        keep = (
            (coords[:, 0] >= lon0 - pad_x) & (coords[:, 0] <= lon1 + pad_x)
            & (coords[:, 1] >= lat0 - pad_y) & (coords[:, 1] <= lat1 + pad_y)
        )
        coords = coords[keep]
        if not len(coords):
            return
        px = np.clip(((coords[:, 0] - lon0) / spanx * w).astype(np.int64), 0, w - 1)
        py = np.clip(((lat1 - coords[:, 1]) / spany * h).astype(np.int64), 0, h - 1)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                mask[np.clip(py + dy, 0, h - 1), np.clip(px + dx, 0, w - 1)] = True

    def _mark_line(coords: np.ndarray):
        coords = coords[~np.isnan(coords).any(axis=1)]
        if len(coords) < 2:
            _mark_points(coords)
            return
        # keep only segments touching the (padded) tile bbox before densifying —
        # far-away geometry costs nothing
        a, b = coords[:-1], coords[1:]
        pad_x, pad_y = spanx, spany
        seg_keep = ~(
            (np.maximum(a[:, 0], b[:, 0]) < lon0 - pad_x)
            | (np.minimum(a[:, 0], b[:, 0]) > lon1 + pad_x)
            | (np.maximum(a[:, 1], b[:, 1]) < lat0 - pad_y)
            | (np.minimum(a[:, 1], b[:, 1]) > lat1 + pad_y)
        )
        if not seg_keep.any():
            return
        a, b = a[seg_keep], b[seg_keep]
        step = min(spanx / w, spany / h)
        n_per = np.clip(
            (np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]) / step).astype(np.int64) + 1,
            1, 4 * max(w, h),
        )
        total = int(n_per.sum())
        idx = np.repeat(np.arange(len(a)), n_per)
        grp_start = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        within = np.arange(total) - np.repeat(grp_start, n_per)
        t = (within / np.maximum(np.repeat(n_per, n_per) - 1, 1))[:, None]
        pts = a[idx] + (b[idx] - a[idx]) * t
        _mark_points(np.vstack([pts, coords[-1:]]))

    def _apply(g):
        kind, payload = g
        if kind == "Point":
            _mark_points(payload.reshape(1, 2))
        elif kind == "LineString":
            _mark_line(payload)
        elif kind == "MultiLineString":
            for l in payload:
                _mark_line(l)
        elif kind == "Polygon":
            # PIP only over the polygon-bbox ∩ tile subgrid — a diff geometry usually
            # covers a sliver of the tile, and the full h×w meshgrid per polygon was
            # the overlay stage's dominant cost (and its shard-skew source)
            ring0 = payload[0]
            fin = ring0[~np.isnan(ring0).any(axis=1)]
            if not len(fin):
                return
            px0, px1 = fin[:, 0].min(), fin[:, 0].max()
            py0, py1 = fin[:, 1].min(), fin[:, 1].max()
            c0 = max(0, int(np.searchsorted(xs, px0, "left")))
            c1 = min(w, int(np.searchsorted(xs, px1, "right")))
            # ys descends (row 0 = north): rows with ys in [py0, py1]
            r0 = max(0, int(np.searchsorted(-ys, -py1, "left")))
            r1 = min(h, int(np.searchsorted(-ys, -py0, "right")))
            if c1 <= c0 or r1 <= r0:
                return
            gx, gy = np.meshgrid(xs[c0:c1], ys[r0:r1])
            inside = G.points_in_polygon(gx.ravel(), gy.ravel(), payload).reshape(
                r1 - r0, c1 - c0
            )
            mask[r0:r1, c0:c1] |= inside
        elif kind == "MultiPolygon":
            for p in payload:
                _apply(("Polygon", p))
        elif kind == "GeometryCollection":
            for sub in payload:
                _apply(sub)

    _apply(geom)
    return mask


def geoms_tile_stats(
    h: int,
    w: int,
    bbox: tuple[float, float, float, float],
    glist: list,
) -> tuple[int, np.ndarray]:
    """All hit geometries of ONE tile rasterized in a single vectorized pass:
    returns (changed_total, union mask) — exactly ``sum(geom_tile_mask(g).sum())``
    and ``OR of geom_tile_mask(g)`` over ``glist``, but without the per-geometry
    full-tile mask/zeros/sum/or passes (~100–700 µs of small-array overhead per
    hit; a batch carries ~10⁴ hits). Point/line marks across ALL geometries
    become one (geom, pixel) pair-key array — ``np.unique`` reproduces the
    per-geometry dedup (a pixel covered twice by one geometry counts once, per
    the mask semantics) — and polygons PIP into their bbox subwindow as before,
    contributing pairs to the same dedup. Formulas (padding, densification
    step, 3×3 neighborhood, clipping) are copied verbatim from
    :func:`geom_tile_mask`, so the result is bit-identical."""
    lat0, lat1, lon0, lon1 = bbox
    spanx = max(lon1 - lon0, 1e-12)
    spany = max(lat1 - lat0, 1e-12)
    ys = lat1 - (np.arange(h) + 0.5) / h * (lat1 - lat0)
    xs = lon0 + (np.arange(w) + 0.5) / w * (lon1 - lon0)

    pt_xy: list[np.ndarray] = []   # point-mark inputs (pre NaN/pad filtering)
    pt_g: list[np.ndarray] = []
    lines: list[tuple[int, np.ndarray]] = []
    polys: list[tuple[int, object]] = []

    def _flatten(gidx: int, g) -> None:
        kind, payload = g
        if kind == "Point":
            pt_xy.append(payload.reshape(1, 2))
            pt_g.append(np.full(1, gidx, np.int64))
        elif kind == "LineString":
            lines.append((gidx, payload))
        elif kind == "MultiLineString":
            for l in payload:
                lines.append((gidx, l))
        elif kind == "Polygon":
            polys.append((gidx, payload))
        elif kind == "MultiPolygon":
            for p in payload:
                polys.append((gidx, p))
        elif kind == "GeometryCollection":
            for sub in payload:
                _flatten(gidx, sub)

    for gidx, g in glist:
        if g is not None:
            _flatten(gidx, g)

    # -- lines: NaN-drop per part, segment bbox prune, densify (all parts at once)
    a_parts, b_parts, seg_g, tail_xy, tail_g = [], [], [], [], []
    for gidx, coords in lines:
        fin = coords[~np.isnan(coords).any(axis=1)]
        if len(fin) < 2:
            pt_xy.append(fin)
            pt_g.append(np.full(len(fin), gidx, np.int64))
            continue
        a, b = fin[:-1], fin[1:]
        seg_keep = ~(
            (np.maximum(a[:, 0], b[:, 0]) < lon0 - spanx)
            | (np.minimum(a[:, 0], b[:, 0]) > lon1 + spanx)
            | (np.maximum(a[:, 1], b[:, 1]) < lat0 - spany)
            | (np.minimum(a[:, 1], b[:, 1]) > lat1 + spany)
        )
        if not seg_keep.any():
            continue
        a_parts.append(a[seg_keep])
        b_parts.append(b[seg_keep])
        seg_g.append(np.full(int(seg_keep.sum()), gidx, np.int64))
        tail_xy.append(fin[-1:])
        tail_g.append(np.full(1, gidx, np.int64))
    if a_parts:
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        sg = np.concatenate(seg_g)
        step = min(spanx / w, spany / h)
        n_per = np.clip(
            (np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]) / step).astype(np.int64) + 1,
            1, 4 * max(w, h),
        )
        total = int(n_per.sum())
        idx = np.repeat(np.arange(len(a)), n_per)
        grp_start = np.concatenate([[0], np.cumsum(n_per)[:-1]])
        within = np.arange(total) - np.repeat(grp_start, n_per)
        t = (within / np.maximum(np.repeat(n_per, n_per) - 1, 1))[:, None]
        pt_xy.append(a[idx] + (b[idx] - a[idx]) * t)
        pt_g.append(sg[idx])
        pt_xy.extend(tail_xy)
        pt_g.extend(tail_g)

    pair_parts: list[np.ndarray] = []
    if pt_xy:
        coords = np.concatenate(pt_xy)
        gidx_a = np.concatenate(pt_g)
        fin = ~np.isnan(coords).any(axis=1)
        coords, gidx_a = coords[fin], gidx_a[fin]
        pad_x, pad_y = spanx * 0.05, spany * 0.05
        keep = (
            (coords[:, 0] >= lon0 - pad_x) & (coords[:, 0] <= lon1 + pad_x)
            & (coords[:, 1] >= lat0 - pad_y) & (coords[:, 1] <= lat1 + pad_y)
        )
        coords, gidx_a = coords[keep], gidx_a[keep]
        if len(coords):
            px = np.clip(((coords[:, 0] - lon0) / spanx * w).astype(np.int64), 0, w - 1)
            py = np.clip(((lat1 - coords[:, 1]) / spany * h).astype(np.int64), 0, h - 1)
            offs = np.arange(-1, 2)
            pyy = np.clip(py[:, None, None] + offs[None, :, None], 0, h - 1)
            pxx = np.clip(px[:, None, None] + offs[None, None, :], 0, w - 1)
            pix = (pyy * w + pxx).reshape(len(coords), 9)
            pair_parts.append(
                (gidx_a[:, None] * np.int64(h * w) + pix).ravel()
            )
    for gidx, payload in polys:
        ring0 = payload[0]
        fin = ring0[~np.isnan(ring0).any(axis=1)]
        if not len(fin):
            continue
        px0, px1 = fin[:, 0].min(), fin[:, 0].max()
        py0, py1 = fin[:, 1].min(), fin[:, 1].max()
        c0 = max(0, int(np.searchsorted(xs, px0, "left")))
        c1 = min(w, int(np.searchsorted(xs, px1, "right")))
        r0 = max(0, int(np.searchsorted(-ys, -py1, "left")))
        r1 = min(h, int(np.searchsorted(-ys, -py0, "right")))
        if c1 <= c0 or r1 <= r0:
            continue
        gx, gy = np.meshgrid(xs[c0:c1], ys[r0:r1])
        inside = G.points_in_polygon(gx.ravel(), gy.ravel(), payload)
        if inside.any():
            loc = np.flatnonzero(inside)
            rows = r0 + loc // (c1 - c0)
            cols = c0 + loc % (c1 - c0)
            pair_parts.append(np.int64(gidx) * np.int64(h * w) + rows * w + cols)
    union = np.zeros(h * w, bool)
    if not pair_parts:
        return 0, union.reshape(h, w)
    pairs = np.unique(np.concatenate(pair_parts))
    union[np.unique(pairs % np.int64(h * w))] = True
    return int(len(pairs)), union.reshape(h, w)


def blend_mask_on_tile(
    pixels: np.ndarray,
    mask: np.ndarray,
    color: tuple[int, int, int] = (255, 0, 0),
    alpha: float = 0.5,
) -> np.ndarray:
    """Alpha-blend ``color`` into ``pixels`` where ``mask`` — one pass per tile."""
    if not mask.any():
        return pixels
    out = pixels.astype(np.float64)
    out[mask] = out[mask] * (1 - alpha) + np.array(color, np.float64) * alpha
    return out.clip(0, 255).astype(np.uint8)


def rasterize_geom_on_tile(
    pixels: np.ndarray,
    bbox: tuple[float, float, float, float],
    geom,
    color: tuple[int, int, int] = (255, 0, 0),
    alpha: float = 0.5,
) -> tuple[np.ndarray, int]:
    """Blend one diff geometry onto decoded tile pixels (mask + single blend).

    Returns (new_pixels, changed_pixel_count)."""
    h, w = pixels.shape[:2]
    mask = geom_tile_mask(h, w, bbox, geom)
    changed = int(mask.sum())
    if changed:
        return blend_mask_on_tile(pixels, mask, color, alpha), changed
    return pixels, 0


