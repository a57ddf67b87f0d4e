"""Augment: the dependency semi-join + fetch that assembles "rows from everywhere" (J5).

Reference (ad/src/main/scala/AugmentedDiff.scala:47-93): (p, id, type) triples from the
update rows ∪ triples from both endpoints of the closure edges; group triples by
partition; fetch matching snapshot rows (partition-pruned keyed ORC reads); union
update ∪ filtered-memory ∪ storage; ``.distinct``.

Rebuild mapping:
* triples → a packed-key set; partitions derived arithmetically from keys
  (sources.snapshot.parts_of_keys).
* memory tier → the per-batch durable Parquet files (sources.snapshot.append-style memory
  store, SURVEY.md §2.5 T2) filtered by the key set (M14 semi-join against broadcast keys).
* storage fetch → partition-pruned parallel Parquet point read (S3/S4 analogue).
* ``.distinct`` (A3) → full-row dedup that *ors* the ``in_update`` provenance flag across
  duplicates — exactly the reference's set-membership window semantics (A4) without
  full-row equality fragility (SURVEY.md §4.4.2).

The dedup canonical form (and thus "the join output row set") is over normalized python
rows because one micro-batch's augmented set is small by construction (minutely churn +
closure); the heavy fetch itself is distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import keys as K
from ..sources import snapshot as SNAP
from .render import rows_from_arrow


def needed_keys(
    update: pa.Table, edges: set[tuple[int, int]]
) -> tuple[set[int], set[int]]:
    """→ (packed key set, partition set) from update rows + both closure-edge endpoints."""
    ks: set[int] = set()
    if len(update):
        ks.update(
            K.pack_typed(
                update["id"].to_numpy(zero_copy_only=False),
                update["type"].to_numpy(zero_copy_only=False),
            ).tolist()
        )
    for a, b in edges:
        ks.add(a)
        ks.add(b)
    if not ks:
        return set(), set()
    arr = np.fromiter(ks, np.int64, len(ks))
    parts = set(SNAP.parts_of_keys(arr).tolist())
    return ks, parts


def needed_keys_np(
    update: pa.Table, ea: np.ndarray, eb: np.ndarray
) -> tuple[np.ndarray, set[int]]:
    """Array form of :func:`needed_keys`: → (sorted unique packed keys, partition set)
    from update rows + both closure-edge endpoints — no Python set churn."""
    parts_list = [ea, eb]
    if len(update):
        parts_list.append(
            K.pack_typed(
                update["id"].to_numpy(zero_copy_only=False),
                update["type"].to_numpy(zero_copy_only=False),
            )
        )
    keys = np.unique(np.concatenate(parts_list)) if parts_list else np.empty(0, np.int64)
    if len(keys) == 0:
        return keys, set()
    parts = set(np.unique(SNAP.parts_of_keys(keys)).tolist())
    return keys, parts


def _row_identity(r: dict) -> tuple:
    """Canonical full-row identity for exact dedup (A3) — everything except provenance.
    (Reference semantics; kept for tests — the hot path uses the vectorized
    :func:`dedup_flag_table`, equivalence asserted in tests.)"""
    return (
        r["type"],
        r["id"],
        r["version"],
        r["timestamp"],
        r["visible"],
        r["changeset"],
        r["uid"],
        r["user"],
        None if r["lat"] is None or (isinstance(r["lat"], float) and np.isnan(r["lat"])) else round(r["lat"], 9),
        None if r["lon"] is None or (isinstance(r["lon"], float) and np.isnan(r["lon"])) else round(r["lon"], 9),
        tuple(sorted(r["tags"].items())),
        tuple(r["nds"]),
        tuple((m["type"], m["ref"], m["role"]) for m in r["members"]),
    )


IDENT_COLS = [
    "type", "id", "version", "timestamp", "visible", "changeset", "uid", "user",
    "lat", "lon", "tags", "nds", "members",
]


def table_meta(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(packed key, epoch-ms timestamp, type rank) per row — the arrays the augment
    semi-join + node-history prune need. Computed ONCE per memory-tier table at append
    time and cached (``AdiffJob._memory_meta``): recomputing them over the whole
    accumulated tier every batch was a driver-serial term that grew with the tier."""
    keys = K.pack_typed(tbl["id"], tbl["type"])
    ts = (
        tbl["timestamp"].combine_chunks().cast(pa.timestamp("ms"))
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    )
    return keys, ts, keys & 3


def row_hashes(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """128-bit identity hash per row (two independent polars row-hash seeds) over the
    non-provenance columns. A row's hash never changes, so callers that hold rows
    across batches (the memory tier) cache these instead of re-hashing the whole
    augmented set every batch — the stream's dominant driver-serial growth term."""
    import polars as pl

    if len(tbl) == 0:
        e = np.empty(0, np.uint64)
        return e, e
    df = pl.from_arrow(tbl.combine_chunks().select(IDENT_COLS))
    return df.hash_rows(seed=1).to_numpy(), df.hash_rows(seed=2).to_numpy()


def dedup_flag_table(
    tbl: pa.Table,
    in_update: np.ndarray,
    hashes: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[pa.Table, np.ndarray]:
    """Vectorized full-row dedup (A3) + OR'd ``in_update`` provenance (A4): rows equal on
    every non-provenance column collapse to their FIRST occurrence (callers concat in
    update→memory→storage priority order). Identity = a 128-bit polars row hash over
    the identity columns (two independent seeds) — no per-row Python. ``hashes``
    optionally supplies precomputed per-row identity hashes (see :func:`row_hashes`)."""
    n = len(tbl)
    if n == 0:
        return tbl, np.zeros(0, bool)
    tbl = tbl.combine_chunks()  # filter/concat inputs arrive heavily chunked; polars
    h1, h2 = hashes if hashes is not None else row_hashes(tbl)  # (and take) degrade per-chunk
    rep, flag = _dedup_indices(h1, h2, in_update)
    return tbl.take(pa.array(rep)), flag


def _dedup_indices(
    h1: np.ndarray, h2: np.ndarray, in_update: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Core of the full-row dedup: per identity-hash group, the FIRST occurrence index
    (priority = caller's row order) and the OR of ``in_update`` across the group.
    Group numbering follows the hash sort, so ``rep``'s order is hash order."""
    n = len(h1)
    if n == 0:
        return np.empty(0, np.int64), np.zeros(0, bool)
    order = np.lexsort((h2, h1))
    s1, s2 = h1[order], h2[order]
    new_grp = np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])]
    gid = np.empty(n, np.int64)
    gid[order] = np.cumsum(new_grp) - 1
    n_grp = int(new_grp.sum())
    rep = np.full(n_grp, n, np.int64)
    np.minimum.at(rep, gid, np.arange(n))
    flag = np.zeros(n_grp, bool)
    np.logical_or.at(flag, gid, np.asarray(in_update, bool))
    return rep, flag


def node_history_prune(
    trank: np.ndarray, ids: np.ndarray, ts: np.ndarray, flag: np.ndarray
) -> np.ndarray:
    """Keep-mask for the augmented domain that drops DEAD node versions.

    Node render histories (stages/render.py ``RenderContext``: node ``complete_p`` is
    constant-True) read exactly two rows per node key: the latest ``in_update`` row and
    the latest non-update row (``_histories`` sorts by -timestamp and takes the first of
    each class). Every older non-update node version can never influence any emitted
    feature, assignment, or kNN row — but the storage/memory tiers return the key's
    whole accumulated history, which for hot keys grows linearly with stream length
    (the per-batch sort/ship/context-build growth term). Ways and relations are NOT
    pruned: their completeness predicates can fall through to older versions.

    Ties at the per-key max timestamp are all kept, so the downstream stable sort
    resolves them exactly as the unpruned domain would."""
    cand = (trank == 0) & ~np.asarray(flag, bool)  # non-update node rows
    return K.latest_ts_mask(ids, ts, cand)


def augment_parts(
    update: pa.Table,
    memory: pa.Table,
    edges: set[tuple[int, int]] | tuple[np.ndarray, np.ndarray],
    snapshot_root: str,
    drop_tags_on_load: bool = True,
    parallel_fetch: bool | str = "auto",
    memory_hashes: tuple[np.ndarray, np.ndarray] | None = None,
    update_hashes: tuple[np.ndarray, np.ndarray] | None = None,
    node_latest_only: bool = False,
    memory_meta: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> tuple[pa.Table, np.ndarray, np.ndarray, np.ndarray]:
    """→ the deduped, provenance-flagged "rows from everywhere" as ONE Arrow table
    (``in_update`` column carries A4 provenance), deterministically ordered
    (type, id, -timestamp, -version). ``edges`` is either the Python pair set or the
    stream's numpy ``(a, b)`` arrays (no driver-side tuple churn).

    ``node_latest_only`` applies :func:`node_history_prune` to the deduped domain —
    the stream's render path opts in (output-identical, pytest-asserted); the
    reference-semantics ``augment_semijoin`` query keeps the full row set."""
    import os
    import time
    _dbg = bool(os.environ.get("AUGDIFF_STAGE_DEBUG"))
    _t0 = time.perf_counter()
    if isinstance(edges, tuple):
        ks, parts = needed_keys_np(update, *edges)
    else:
        ks, parts = needed_keys(update, edges)

    protect_mix = None
    if node_latest_only and len(update):
        # (key, ts) fingerprints of the update rows: tier rows matching one are
        # possible re-delivered duplicates — in_update=True after the dedup OR — so
        # the tier-side prunes must treat them as update rows (neither prune nor
        # let them suppress an older sibling). Collisions only reduce pruning.
        uk, uts, _ = table_meta(update)
        protect_mix = np.sort(K.mix_key_ts(uk, uts))

    parts_list: list[pa.Table] = []
    flags_list: list[np.ndarray] = []
    hash_list: list[tuple[np.ndarray, np.ndarray]] = []
    cols = update.column_names

    parts_list.append(update)
    flags_list.append(np.ones(len(update), bool))
    hash_list.append(
        update_hashes if update_hashes is not None else row_hashes(update.select(cols))
    )

    _m0 = time.perf_counter()
    if memory is not None and len(memory):
        mk = memory_meta[0] if memory_meta is not None else K.pack_typed(
            memory["id"], memory["type"]
        )
        if len(ks) == 0:
            mask = np.zeros(len(memory), bool)
        elif isinstance(ks, np.ndarray):  # ks sorted-unique → searchsorted beats isin
            pos = np.minimum(np.searchsorted(ks, mk), len(ks) - 1)
            mask = ks[pos] == mk
        else:
            mask = np.isin(mk, np.fromiter(ks, np.int64, len(ks)))
        _m1 = time.perf_counter()
        if node_latest_only and mask.any():
            # tier-side prune (conservative superset of node_history_prune, which
            # still runs globally below): the semi-join mask is per-key complete, so
            # the within-tier latest node version is well-defined on the subset
            if memory_meta is not None:
                mts, mtr = memory_meta[1], memory_meta[2]
            else:
                _, mts, mtr = table_meta(memory)
            idx = np.flatnonzero(mask)
            cand = mtr[idx] == 0
            if protect_mix is not None:
                cand &= ~K.isin_sorted(
                    K.mix_key_ts(mk[idx], mts[idx]), protect_mix
                )
            keep = K.latest_ts_mask(mk[idx], mts[idx], cand)
            mask[idx[~keep]] = False
        _m2 = time.perf_counter()
        mem_f = memory.filter(pa.array(mask)).select(cols)
        _m3 = time.perf_counter()
        parts_list.append(mem_f)
        flags_list.append(np.zeros(len(mem_f), bool))
        if memory_hashes is not None:  # cached across batches — rows never re-hashed
            hash_list.append((memory_hashes[0][mask], memory_hashes[1][mask]))
        else:
            hash_list.append(row_hashes(mem_f))
        if _dbg:
            print(f"[aug.keys] tier={len(memory)} hits={len(mem_f)} "
                  f"nk={_m0-_t0:.3f} mask={_m1-_m0:.3f} prune={_m2-_m1:.3f} "
                  f"filter={_m3-_m2:.3f} hcat={time.perf_counter()-_m3:.3f}",
                  flush=True)

    _t1 = time.perf_counter()
    storage = SNAP.load_keyed(
        snapshot_root, parts, ks,
        drop_tags_on_load=drop_tags_on_load,
        parallel=parallel_fetch,
        node_latest_only=node_latest_only,
        protect_mix=protect_mix,
    )
    _t2 = time.perf_counter()
    if len(storage):
        storage = storage.select(cols)
        parts_list.append(storage)
        flags_list.append(np.zeros(len(storage), bool))
        hash_list.append(row_hashes(storage))
    _t3 = time.perf_counter()

    big = pa.concat_tables(parts_list, promote_options="default")
    _t4 = time.perf_counter()
    rep, flag = _dedup_indices(
        np.concatenate([h[0] for h in hash_list]),
        np.concatenate([h[1] for h in hash_list]),
        np.concatenate(flags_list),
    )
    _t5 = time.perf_counter()

    # deterministic order (type rank, id, -timestamp, -version; stable on source
    # priority) over the DEDUPED domain — all numpy gathers on ``big``; the 10^5-row
    # nested-column table is never materialized on the driver (the render scatter
    # takes per-shard subsets straight from ``big`` via ``rep[order]``)
    trank = K.type_code(big["type"])[rep]
    ids = big["id"].to_numpy(zero_copy_only=False)[rep]
    ts = big["timestamp"].combine_chunks().cast(pa.timestamp("ms")).cast(pa.int64()).to_numpy(zero_copy_only=False)[rep]
    ver = big["version"].to_numpy(zero_copy_only=False)[rep]
    if node_latest_only:
        keep = node_history_prune(trank, ids, ts, flag)
        rep, flag = rep[keep], flag[keep]
        trank, ids, ts, ver = trank[keep], ids[keep], ts[keep], ver[keep]
    _t6 = time.perf_counter()
    order = np.lexsort((np.arange(len(rep)), -ver, -ts, ids, trank))
    if _dbg:
        print(f"[augment] keys={_t1-_t0:.3f} fetch={_t2-_t1:.3f} "
              f"shash={_t3-_t2:.3f} concat={_t4-_t3:.3f} didx={_t5-_t4:.3f} "
              f"gather={_t6-_t5:.3f} lex={time.perf_counter()-_t6:.3f} "
              f"rows={len(rep)} nstore={len(storage)} nbig={len(big)}", flush=True)
    return big, rep, flag, order


def augment_table(
    update: pa.Table,
    memory: pa.Table,
    edges: set[tuple[int, int]] | tuple[np.ndarray, np.ndarray],
    snapshot_root: str,
    drop_tags_on_load: bool = True,
    parallel_fetch: bool | str = "auto",
    memory_hashes: tuple[np.ndarray, np.ndarray] | None = None,
) -> pa.Table:
    """Materialized view of :func:`augment_parts`: the deduped, provenance-flagged
    "rows from everywhere" as ONE Arrow table, deterministically ordered
    (type, id, -timestamp, -version). The stream's scatter path uses
    :func:`augment_parts` directly to avoid this driver-side take."""
    big, rep, flag, order = augment_parts(
        update, memory, edges, snapshot_root,
        drop_tags_on_load=drop_tags_on_load,
        parallel_fetch=parallel_fetch,
        memory_hashes=memory_hashes,
    )
    sel = rep[order]
    dedup = big.combine_chunks().take(pa.array(sel))
    return dedup.append_column("in_update", pa.array(flag[order]))


def augment_rows(*args, **kwargs) -> list[dict]:
    """Dict-row view of :func:`augment_table` (local render path + tests)."""
    return rows_from_arrow(augment_table(*args, **kwargs))
