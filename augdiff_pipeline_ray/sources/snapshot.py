"""Cell-partitioned Parquet snapshot: sorted write (S5) and keyed point-read (S3/S4).

Replaces the reference's Hive/ORC backend (common/src/main/scala/OrcBackend.scala):

* **write** (:268-292): ``repartition(p) → sortWithinPartitions(id, type) → ORC partitioned
  by p with bloom(id)`` becomes ``ds.sort([p, key]) → write_parquet(partition_cols=[p])``.
  The partition column is the reference's own id-derived ``p`` (keys.partition_number,
  Common.scala:59-72, ≤2^11 buckets): the keyed fetch path addresses rows by packed key
  alone, and ``p`` is computable from the key — so point reads prune partitions with no
  directory lookup. (``cell`` remains the engine's partition key for the *spatial* side:
  tile assignment, render fan-out, lineage — SURVEY.md §7.2.) Parquet row-group stats on
  the sorted ``key`` column replace the ORC bloom filter + row-index stride for
  point-read skipping.
* **pruned keyed load** (:233-266 + 43-231): the reference regex-matches partition dirs
  then hand-decodes ORC with a SearchArgument IN(id…) pushdown. Here: prune partition
  directories by the wanted ``part`` set, then a parallel Ray Data read of just those
  directories with an Arrow ``is_in`` filter on the packed key — executed as
  ``read_parquet(dirs).map_batches(filter)`` so the fetch fans out across the cluster.
* **reference-compat tag drop**: `OrcBackend.loadFile` short-circuits tag decoding
  (``&& false) { // XXX`` at OrcBackend.scala:105), so every storage-loaded row has empty
  tags. ``drop_tags_on_load=True`` (default) reproduces that for conformance; pass False
  for the corrected behavior (SURVEY.md §4.4.1).
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .. import keys as K
from ..schemas import ELEMENT_SCHEMA

def with_part_and_key(batch: pa.Table) -> pa.Table:
    """Stamp derived columns: ``part`` (the reference partition ``p`` of the packed key)
    and ``key`` (packed id/type)."""
    ids = batch["id"].to_numpy(zero_copy_only=False)
    types = batch["type"].to_numpy(zero_copy_only=False)
    part = K.partition_number_typed(ids, types)
    key = K.pack_typed(ids, types)
    out = batch
    for name, arr in (("part", part), ("key", key)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, pa.array(arr))
    return out


def parts_of_keys(keys: np.ndarray) -> np.ndarray:
    """packed keys → their snapshot partitions (pure arithmetic, no directory lookup)."""
    return K.partition_number(K.unpack_id(keys), K.unpack_code(keys))


def write_snapshot(ds: rd.Dataset, root: str, mode: str = "overwrite") -> None:
    """Sorted, partitioned snapshot write (S5 analogue).

    Range-partition sort by (part, key), then each sorted block writes its rows into
    ``part=<p>/keys-<min>-<max>.parquet`` — deterministic names (sorted blocks cover
    disjoint key ranges) so a re-run overwrites rather than duplicates, and one file per
    (block, part) keeps the layout resumable. (Ray's ``write_parquet(partition_cols=…)``
    delegates to pyarrow's dataset writer, which caps a fragment at 1024 partitions —
    the explicit writer sidesteps that and writes tmp+rename atomically.)
    """
    ds = ds.map_batches(with_part_and_key, batch_format="pyarrow").materialize()
    if mode == "overwrite" and os.path.isdir(root):
        import shutil

        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    # size-adaptive: a small element table sorts/writes faster in-process than the
    # distributed range-partition sort can even schedule
    if ds.count() <= 200_000:
        tbl = pa.concat_tables(
            [
                b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
            ],
            promote_options="default",
        ).sort_by([("part", "ascending"), ("key", "ascending")])
        parts = tbl["part"].to_numpy(zero_copy_only=False)
        keys = tbl["key"].to_numpy(zero_copy_only=False)
        bounds = np.nonzero(np.diff(parts))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(tbl)]])
        for s, e in zip(starts, ends):
            p = int(parts[s])
            sub = tbl.slice(s, e - s).drop_columns(["part"])
            d = Path(root) / f"part={p}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".keys-{keys[s]}-{keys[e-1]}.tmp"
            pq.write_table(sub, tmp)
            os.replace(tmp, d / f"keys-{keys[s]}-{keys[e-1]}.parquet")
        return

    ds = ds.sort(["part", "key"])

    def write_block(batch: pa.Table) -> pa.Table:
        parts = batch["part"].to_numpy(zero_copy_only=False)
        keys = batch["key"].to_numpy(zero_copy_only=False)
        out_parts, out_rows = [], []
        for p in np.unique(parts):
            mask = parts == p
            sub = batch.filter(pa.array(mask)).drop_columns(["part"])
            kmin, kmax = keys[mask].min(), keys[mask].max()
            d = Path(root) / f"part={int(p)}"
            d.mkdir(parents=True, exist_ok=True)
            tmp = d / f".keys-{kmin}-{kmax}.tmp"
            pq.write_table(sub, tmp)
            os.replace(tmp, d / f"keys-{kmin}-{kmax}.parquet")
            out_parts.append(int(p))
            out_rows.append(int(mask.sum()))
        return pa.table({"part": pa.array(out_parts, pa.int64()),
                         "rows": pa.array(out_rows, pa.int64())})

    # consume the manifest stream (small) to drive execution
    for _ in ds.map_batches(write_block, batch_format="pyarrow").iter_batches(
        batch_size=None
    ):
        pass


def append_rows(table: pa.Table, root: str, batch_seq: int) -> None:
    """Micro-batch flush append (the reference's memory-tier flush, S5 'append' mode) —
    one idempotent file per (part, batch_seq)."""
    if len(table) == 0:
        return
    table = with_part_and_key(table)
    parts = table["part"].to_numpy(zero_copy_only=False)
    for p in np.unique(parts):
        sub = table.filter(pa.array(parts == p)).drop_columns(["part"])
        d = Path(root) / f"part={int(p)}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(sub, d / f"batch-{batch_seq:09d}.parquet")


def append_delta(table: pa.Table, root: str, batch_seq: int) -> None:
    """Delta-tier flush append: ONE idempotent file per flush under ``root/delta/``.

    The per-(part, batch) layout (:func:`append_rows`) costs one tiny file write per
    touched partition per flush — thousands of writes when churn spreads across the id
    space. The delta tier is the LSM shape instead: flushes land as single sorted
    files, point reads scan base (part-pruned) + delta (small, recent), and the
    whole-table cache absorbs delta rows in place (:func:`append_to_cache`)."""
    if len(table) == 0:
        return
    table = with_part_and_key(table).drop_columns(["part"]).sort_by("key")
    d = Path(root) / "delta"
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".batch-{batch_seq:09d}.tmp"
    pq.write_table(table, tmp)
    final = d / f"batch-{batch_seq:09d}.parquet"
    os.replace(tmp, final)
    # prime the in-process delta cache with the rows just written: the flushing
    # process's own point reads otherwise re-read every delta FILE on every
    # micro-batch (an O(flushed-history) per-batch growth term)
    _DELTA_TBL_CACHE.setdefault(root, {})[str(final)] = (
        table, table["key"].to_numpy(zero_copy_only=False)
    )


def _delta_files(root: str) -> list[str]:
    d = os.path.join(root, "delta")
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


DELTA_CACHE_MAX_BYTES = 256 * 1024 * 1024


def _delta_hits_for(root: str, wk: np.ndarray) -> list[pa.Table]:
    """Point-read hits from the delta tier for sorted-unique keys ``wk``.

    Delta files are key-sorted (:func:`append_delta`), so each file serves hits as a
    searchsorted range gather — O(|wk| log n + hits) — from an in-process table cache
    (byte-capped; cold files are read once). Re-reading and is_in-scanning EVERY delta
    file on every micro-batch made the stream's point-read cost grow with the number
    of completed flushes. Ascending gather indices reproduce the file row order, so
    hits are byte-identical to the old filter path."""
    files = _delta_files(root)
    if not files:
        return []
    cache = _DELTA_TBL_CACHE.setdefault(root, {})
    for stale in set(cache) - set(files):  # compaction/cleanup removed a file
        del cache[stale]
    hits: list[pa.Table] = []
    for f in files:
        ent = cache.get(f)
        if ent is None:
            t = pq.read_table(f)
            k = t["key"].to_numpy(zero_copy_only=False)
            if sum(e[0].nbytes for e in cache.values()) + t.nbytes <= DELTA_CACHE_MAX_BYTES:
                cache[f] = (t, k)
        else:
            t, k = ent
        lo = np.searchsorted(k, wk, side="left")
        hi = np.searchsorted(k, wk, side="right")
        lens = hi - lo
        total = int(lens.sum())
        if not total:
            continue
        idx = np.repeat(lo, lens) + (
            np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        hits.append(t.take(pa.array(idx, pa.int64())))
    return hits


def _apply_tag_drop(tbl: pa.Table, drop: bool) -> pa.Table:
    """Reference-compat storage tag drop (OrcBackend.scala:105)."""
    if drop and len(tbl):
        empty = pa.array([[]] * len(tbl), type=tbl.schema.field("tags").type)
        i = tbl.schema.get_field_index("tags")
        tbl = tbl.set_column(i, "tags", empty)
    return tbl


def _ts_ms(tbl: pa.Table) -> np.ndarray:
    return (
        tbl["timestamp"].combine_chunks().cast(pa.timestamp("ms"))
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    )


def _node_latest_mask(
    keys: np.ndarray, ts: np.ndarray, suspect: np.ndarray | None = None
) -> np.ndarray:
    """Per-row bool: True unless the row is a NODE version (packed-key low bits 0)
    older than its key's max timestamp among non-``suspect`` rows. Suspect rows
    (possible full-row duplicates of a current-update row — they'd turn
    ``in_update=True`` after the augment dedup OR) neither prune nor suppress."""
    cand = (keys & 3) == 0
    if suspect is not None:
        cand &= ~suspect
    return K.latest_ts_mask(keys, ts, cand)


def _latest_merge(
    meta: tuple, nk: np.ndarray, nts: np.ndarray
) -> tuple:
    """Fold appended rows (nk, nts) into latest-version metadata
    ``(keys, ts, mix, latest)`` — exactly equivalent to recomputing
    ``_node_latest_mask`` over the concatenation (pytest-asserted), but touching
    only the appended rows and the previously-latest rows of the keys they name.

    Invariant used: every node row with ``latest=True`` carries its key's max
    timestamp (ties are all kept), so the OLD per-key max is readable from any
    True row without scanning history."""
    ck, cts, cmix, latest = meta
    nn = (nk & 3) == 0
    app_keep = np.ones(len(nk), bool)
    latest = latest.copy()
    if nn.any():
        k2, t2 = nk[nn], nts[nn]
        o = np.lexsort((-t2, k2))
        ks, tsr = k2[o], t2[o]
        head = np.r_[True, ks[1:] != ks[:-1]]
        app_keys, app_max = ks[head], tsr[head]  # sorted unique keys + their max ts
        # previously-latest node rows of the touched keys: flip if superseded,
        # and read the OLD per-key max from them
        tr = np.flatnonzero(latest & ((ck & 3) == 0))
        pos = np.searchsorted(app_keys, ck[tr])
        hit = (pos < len(app_keys)) & (app_keys[np.minimum(pos, len(app_keys) - 1)] == ck[tr])
        old_max = np.full(len(app_keys), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(old_max, pos[hit], cts[tr[hit]])
        latest[tr[hit]] = cts[tr[hit]] >= app_max[pos[hit]]
        gmax = np.maximum(app_max, old_max)
        p2 = np.searchsorted(app_keys, k2)
        app_keep[np.flatnonzero(nn)] = t2 == gmax[p2]
    return (
        np.concatenate([ck, nk]),
        np.concatenate([cts, nts]),
        np.concatenate([cmix, K.mix_key_ts(nk, nts)]),
        np.concatenate([latest, app_keep]),
    )


def prune_node_latest(tbl: pa.Table, protect_mix: np.ndarray | None = None) -> pa.Table:
    """Drop node rows that are not their key's latest version WITHIN ``tbl``.

    Point-read pushdown for the stream's render domain (see stages.augment
    ``node_history_prune`` for the output-equivalence argument): a keyed fetch
    returns every stored version of a hot key — history that the augment stage
    would prune anyway, after paying to hash/sort/ship it. Because a keyed fetch
    is per-key complete, the within-table latest IS the storage-tier latest.
    ``protect_mix``: sorted ``K.mix_key_ts`` of the current update's rows —
    matching rows are suspects (see :func:`_node_latest_mask`)."""
    if len(tbl) == 0:
        return tbl
    keys = tbl["key"].to_numpy(zero_copy_only=False)
    ts = _ts_ms(tbl)
    suspect = None
    if protect_mix is not None and len(protect_mix):
        suspect = K.isin_sorted(K.mix_key_ts(keys, ts), protect_mix)
    keep = _node_latest_mask(keys, ts, suspect)
    if keep.all():
        return tbl
    return tbl.filter(pa.array(keep))


def _build_whole_cache(root: str) -> pa.Table:
    """Base part files + delta tier → one combined, single-chunk in-memory table.
    (One chunk: a thousands-of-part-files store pays ~10x per-chunk overhead on
    every point-read filter otherwise.)"""
    import pyarrow.dataset as pads

    whole = pads.dataset(root, format="parquet", partitioning="hive",
                         ignore_prefixes=[".", "_", "delta"]).to_table()
    if "part" in whole.column_names:
        whole = whole.drop_columns(["part"])
    deltas = [pq.read_table(f) for f in _delta_files(root)]
    if deltas:
        whole = pa.concat_tables(
            [whole] + [t.select(whole.column_names) for t in deltas],
            promote_options="default",
        )
    whole = whole.combine_chunks()
    # KEY-SORTED (stable): point reads become searchsorted range gathers, O(hits)
    # instead of an O(cache) is_in scan per micro-batch (a growth term: the cache
    # accumulates the store's whole history across flushes)
    keys = whole["key"].to_numpy(zero_copy_only=False)
    if not (keys[1:] >= keys[:-1]).all():  # already sorted → skip the copy
        order = np.argsort(keys, kind="stable")
        whole = whole.take(pa.array(order)).combine_chunks()
    return whole


def merged_cache(root: str, table: pa.Table):
    """Compute (but do NOT publish) the hot-store cache with ``table``'s rows folded
    in — the expensive half of :func:`append_to_cache` (concat + key re-sort + latest
    metadata merge), side-effect-free over immutable inputs so the stream's async
    flush can run it in a background thread. Returns ``(whole, meta)`` or ``None``
    when there is no cache to fold into (or nothing to fold)."""
    cached = _TABLE_CACHE.get(root)
    if cached is None or len(table) == 0:
        return None
    table = with_part_and_key(table).drop_columns(["part"]).select(cached.column_names)
    whole = pa.concat_tables(
        [cached, table], promote_options="default"
    ).combine_chunks()
    meta = _LATEST_CACHE.get(root)
    if meta is not None:
        # merge the appended rows into the latest-version metadata incrementally:
        # O(append + latest-rows of touched keys), NOT a whole-cache recompute —
        # the flush-time cost must stay flat as the store's history accumulates
        nk = table["key"].to_numpy(zero_copy_only=False)
        nts = _ts_ms(table)
        meta = _latest_merge(meta, nk, nts)
    # restore the key-sort invariant (stable) and permute the metadata with it
    keys = whole["key"].to_numpy(zero_copy_only=False)
    if not (keys[1:] >= keys[:-1]).all():
        order = np.argsort(keys, kind="stable")
        whole = whole.take(pa.array(order)).combine_chunks()
        if meta is not None:
            meta = tuple(arr[order] for arr in meta)
    serve = _build_serve_view(meta) if meta is not None else None
    return whole, meta, serve


def adopt_cache(root: str, merged) -> None:
    """Publish a :func:`merged_cache` result (atomic dict swaps — driver thread only)."""
    if merged is None:
        return
    whole, meta, serve = merged
    _TABLE_CACHE[root] = whole
    if meta is not None:
        _LATEST_CACHE[root] = meta
    else:
        _LATEST_CACHE.pop(root, None)
    if serve is not None:
        _SERVE_CACHE[root] = serve
    else:
        _SERVE_CACHE.pop(root, None)


def append_to_cache(root: str, table: pa.Table) -> None:
    """Fold freshly-flushed rows into the hot-store cache in place — rescanning a
    many-thousand-file store after every flush was a multi-second stall per interval."""
    adopt_cache(root, merged_cache(root, table))


def drop_cache(root: str) -> None:
    """Invalidate this process's hot-store caches for ``root`` — the next point read
    lazily rebuilds from disk (base parts + delta files, :func:`_build_whole_cache`).
    The stream driver uses this at flush adoption instead of folding: with the
    augment stage off-driver, the driver never point-reads the store again, so
    computing ``merged_cache`` on its serial path was pure waste."""
    _TABLE_CACHE.pop(root, None)
    _LATEST_CACHE.pop(root, None)
    _SERVE_CACHE.pop(root, None)


def list_partitions(root: str) -> set[int]:
    if not os.path.isdir(root):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith("part=")
    }


PARALLEL_LOAD_MIN_BYTES = 64 * 1024 * 1024  # below this, Ray startup dwarfs the read


class _ProcessLocalCache(dict):
    """A dict that never ships between processes: pickles to an empty instance.

    This module is cloudpickle-registered by VALUE (the repo is never installed on
    workers), so any function/class shipped to an actor captures the module globals
    it references — including these caches' CONTENTS at export time. A driver whose
    hot-cache was warm would silently ship the whole snapshot table inside every
    actor definition (observed: a 30 MiB AugmentShard at sf0.1; unbounded at the
    10^12-row scale). Each process warms its own cache instead (the documented
    protocol — actors call ``warm_cache`` in ``__init__``)."""

    def __reduce__(self):
        return (self.__class__, ())


_PADS_CACHE: dict = _ProcessLocalCache()
_TABLE_CACHE: dict = _ProcessLocalCache()
_LATEST_CACHE: dict = _ProcessLocalCache()  # root → _node_latest_mask over _TABLE_CACHE rows
_DELTA_TBL_CACHE: dict = _ProcessLocalCache()  # root → {delta path: (table, sorted keys)}
_SERVE_CACHE: dict = _ProcessLocalCache()  # root → _build_serve_view over _LATEST_CACHE


def _build_serve_view(meta: tuple) -> tuple:
    """Latest-only serving view over the key-sorted cache: positions of the rows a
    ``node_latest_only`` point read can serve (latest node versions + all non-node
    rows) plus a (mix → row) index for suspect lookups.

    Without it, the gather had to enumerate EVERY stored version of each wanted key
    before masking — the per-batch fetch cost grew linearly with the stream's
    flushed history (hot keys accumulate one version per churn batch, forever).
    With it: O(served hits) per read, flat; suspects (re-delivered rows, normally
    zero mid-stream) are located via the sorted mix index in O(|update| log n) and
    only their keys pay a full-history repair."""
    ck, cts, cmix, latest = meta
    pos_keep = np.flatnonzero(latest)
    cmix_order = np.argsort(cmix, kind="stable")
    return (len(ck), pos_keep, ck[pos_keep], cmix[cmix_order], cmix_order)
TABLE_CACHE_MAX_BYTES = 128 * 1024 * 1024


def invalidate_pads_cache(root: str) -> None:
    """Drop cached handles/tables for ``root`` (call after appending files)."""
    _PADS_CACHE.pop(root, None)
    _TABLE_CACHE.pop(root, None)
    _LATEST_CACHE.pop(root, None)
    _DELTA_TBL_CACHE.pop(root, None)
    _SERVE_CACHE.pop(root, None)


def warm_cache(root: str) -> None:
    """Pre-build the hot-snapshot cache tier (whole-table cache under the size cap,
    else the pyarrow dataset handle) so the first stream batch's point-read doesn't
    pay the store scan. Driver-process-local, idempotent."""
    import glob

    import pyarrow.dataset as pads

    if root in _TABLE_CACHE or root in _PADS_CACHE or not os.path.isdir(root):
        return
    all_files = glob.glob(os.path.join(root, "part=*", "*.parquet"))
    if not all_files:
        return
    if sum(os.path.getsize(f) for f in all_files) <= TABLE_CACHE_MAX_BYTES:
        _TABLE_CACHE[root] = _build_whole_cache(root)
    else:
        _PADS_CACHE[root] = pads.dataset(root, format="parquet", partitioning="hive",
                                         ignore_prefixes=[".", "_", "delta"])


def load_keyed(
    root: str,
    wanted_parts: set[int],
    wanted_keys: "set[int] | np.ndarray",
    drop_tags_on_load: bool = True,
    parallel: bool | str = "auto",
    node_latest_only: bool = False,
    protect_mix: np.ndarray | None = None,
) -> pa.Table:
    """Partition-pruned point read: rows whose packed key ∈ wanted_keys (a Python set
    or an int64 numpy array — the stream's numpy edge path passes the latter,
    zero-copy into Arrow), scanning only partition dirs in wanted_parts.

    ``node_latest_only=True`` additionally drops non-latest node versions
    (:func:`prune_node_latest`) — on the whole-table-cache path via per-row metadata
    precomputed once per cache build, not once per read. ``protect_mix`` (sorted
    ``K.mix_key_ts`` of the current update) marks suspect re-delivered rows that
    must neither prune nor suppress."""
    avail = list_partitions(root)
    scan = sorted(wanted_parts & avail)
    if not scan or len(wanted_keys) == 0:
        return ELEMENT_SCHEMA.empty_table()
    import glob

    dirs = [
        f
        for p in scan
        for f in sorted(glob.glob(os.path.join(root, f"part={p}", "*.parquet")))
    ]
    if not dirs:
        return ELEMENT_SCHEMA.empty_table()
    if isinstance(wanted_keys, np.ndarray):
        wk = np.unique(wanted_keys)  # sorted unique — all read paths gather on this
    else:
        wk = np.unique(np.fromiter(wanted_keys, np.int64, len(wanted_keys)))
    keys_arr = pa.array(wk)

    def _filter(batch: pa.Table) -> pa.Table:
        # the scanner already applied the key predicate (pushed down via
        # ``read_parquet(filter=...)`` — row groups pruned by min/max stats on the
        # sorted key); only the reference-compat tag drop remains per batch
        out = batch
        if "part" in out.column_names:  # hive-inferred; local path drops it too
            out = out.drop_columns(["part"])
        if node_latest_only and len(out):
            # per-read-task pre-prune (a key's versions may span tasks, so this is a
            # conservative superset — sound by the same suppressor argument as the
            # tier prunes since suspects are respected); the driver-side
            # prune_node_latest on the concat stays the exact final word
            out = prune_node_latest(out, protect_mix)
        if drop_tags_on_load and len(out):
            empty = pa.array([[]] * len(out), type=out.schema.field("tags").type)
            i = out.schema.get_field_index("tags")
            out = out.set_column(i, "tags", empty)
        return out

    def _delta_hits() -> list[pa.Table]:
        return _delta_hits_for(root, wk)

    if parallel == "auto":
        total = sum(os.path.getsize(f) for f in dirs)
        parallel = total >= PARALLEL_LOAD_MIN_BYTES
    if parallel:
        import pyarrow.dataset as pads

        ds = rd.read_parquet(dirs, filter=pads.field("key").isin(keys_arr))
        ds = ds.map_batches(_filter, batch_format="pyarrow")
        base = _collect(ds)
        deltas = _delta_hits()
        if deltas:
            deltas = [_apply_tag_drop(t, drop_tags_on_load) for t in deltas]
            base = pa.concat_tables(
                [base] + [t.select(base.column_names) for t in deltas],
                promote_options="default",
            )
        # prune AFTER base+delta concat: a key's versions span both tiers, and the
        # latest must be the latest across the whole fetch
        return prune_node_latest(base, protect_mix) if node_latest_only else base
    # local path. A small store (sandbox scale: thousands of ~100-row part files) pays
    # more in per-file footer reads than the data is worth — cache the WHOLE store in
    # memory once (the hot-snapshot-cache tier; invalidated on flush) and serve point
    # reads with a vectorized is_in. Bigger stores use one pyarrow dataset scan with
    # hive-partition pruning + row-group stats pruning on the sorted key.
    import pyarrow.dataset as pads

    cached = _TABLE_CACHE.get(root)
    if cached is None:
        all_files = sorted(glob.glob(os.path.join(root, "part=*", "*.parquet")))
        total_bytes = sum(os.path.getsize(f) for f in all_files)
        if total_bytes <= TABLE_CACHE_MAX_BYTES:
            cached = _TABLE_CACHE[root] = _build_whole_cache(root)
    if cached is not None:
        meta = _LATEST_CACHE.get(root)
        if meta is None or len(meta[0]) != len(cached):
            ck = cached["key"].to_numpy(zero_copy_only=False)
            cts = _ts_ms(cached)
            meta = _LATEST_CACHE[root] = (
                ck, cts, K.mix_key_ts(ck, cts), _node_latest_mask(ck, cts)
            )
        ck, cts, cmix, latest = meta

        def _ranges(sorted_keys: np.ndarray, want: np.ndarray) -> np.ndarray:
            lo = np.searchsorted(sorted_keys, want, side="left")
            hi = np.searchsorted(sorted_keys, want, side="right")
            lens = hi - lo
            total = int(lens.sum())
            return np.repeat(lo, lens) + (
                np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            )

        if not node_latest_only:
            # full-history fetch (reference-exact semantics): every stored version
            # of every wanted key, via the key-sorted range gather
            idx = _ranges(ck, wk)
            return _apply_tag_drop(
                cached.take(pa.array(idx, pa.int64())), drop_tags_on_load
            )
        # latest-only fetch: gather from the precomputed serving view — O(served
        # hits) per read, NOT O(all stored versions of the wanted keys), which grew
        # linearly with the stream's flushed history (see _build_serve_view)
        serve = _SERVE_CACHE.get(root)
        if serve is None or serve[0] != len(ck):
            serve = _SERVE_CACHE[root] = _build_serve_view(meta)
        _, pos_keep, ck_keep, cmix_sorted, cmix_order = serve
        idx = pos_keep[_ranges(ck_keep, wk)]
        if protect_mix is not None and len(protect_mix):
            # suspects = stored rows matching an update row's (key, ts) fingerprint
            # (normally none mid-stream; nonzero on re-delivery/recompute). Located
            # via the sorted mix index in O(|update| log cache); their keys get the
            # exact full-history repair — suspects neither prune nor suppress.
            spos = cmix_order[_ranges(cmix_sorted, protect_mix)]
            if len(spos):
                skeys = np.unique(ck[spos])
                akeys = skeys[K.isin_sorted(skeys, wk)]
                if len(akeys):
                    aidx = _ranges(ck, akeys)  # full history of affected keys
                    keep_a = _node_latest_mask(
                        ck[aidx], cts[aidx],
                        K.isin_sorted(cmix[aidx], protect_mix),
                    )
                    drop = K.isin_sorted(ck[idx], akeys)
                    idx = np.concatenate([idx[~drop], aidx[keep_a]])
                    idx.sort()  # restore the ascending (cache-order) gather
        return _apply_tag_drop(
            cached.take(pa.array(idx, pa.int64())), drop_tags_on_load
        )
    else:
        pads_ds = _PADS_CACHE.get(root)
        if pads_ds is None:
            pads_ds = pads.dataset(root, format="parquet", partitioning="hive",
                                   ignore_prefixes=[".", "_", "delta"])
            _PADS_CACHE[root] = pads_ds
        flt = pads.field("part").isin(list(scan)) & pads.field("key").isin(keys_arr)
        tbl = pads_ds.to_table(filter=flt)
        if "part" in tbl.column_names:
            tbl = tbl.drop_columns(["part"])
        deltas = _delta_hits()
        if deltas:
            tbl = pa.concat_tables(
                [tbl] + [t.select(tbl.column_names) for t in deltas],
                promote_options="default",
            )
    if node_latest_only:
        tbl = prune_node_latest(tbl, protect_mix)
    return _apply_tag_drop(tbl, drop_tags_on_load)


def _collect(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small, already-filtered) dataset to one Arrow table."""
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not batches:
        return ELEMENT_SCHEMA.empty_table()
    return pa.concat_tables(batches, promote_options="default")
