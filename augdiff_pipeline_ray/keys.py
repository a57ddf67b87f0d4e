"""Packed entity keys and the reference partition function — vectorized.

Semantics reproduced from the reference (cited for parity, not copied):

* packed key ``(id << 2) | type_code`` with node=0, way=1, relation=2 — the single int64
  that addresses any OSM element and is the join key of the whole system
  (reference: common/src/main/scala/Common.scala:35-57).
* ``partition_number`` — repeatedly integer-divide ``id`` by 10 until it is < 2^11, then
  XOR the type code; ≈2048 coarse, deliberately skewed buckets
  (reference: common/src/main/scala/Common.scala:33,59-72).

All functions accept numpy arrays (or pyarrow arrays, converted zero-copy where possible)
and return numpy arrays; scalars work too. These run inside ``map_batches`` hot loops, so
they are branch-free vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NODE = 0
WAY = 1
RELATION = 2

TYPE_CODES = {"node": NODE, "way": WAY, "relation": RELATION}
TYPE_NAMES = {NODE: "node", WAY: "way", RELATION: "relation"}

# Member-type compression codes used inside relation member structs
# (reference: ingest ProcessOSM.scala:3-8 uses node=1, way=2, relation=3).
MEMBER_CODES = {"node": 1, "way": 2, "relation": 3}
MEMBER_NAMES = {1: "node", 2: "way", 3: "relation"}

# partitionNumberFn squashes ids down to ≤ 2^11 (bits = 12 → threshold 2^(12-1));
# the reference loops strictly while id > 2048, so 2048 itself is kept.
PARTITION_BITS = 12
PARTITION_LIMIT = 1 << (PARTITION_BITS - 1)  # 2048


def _as_np(x, dtype=np.int64) -> np.ndarray:
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = x.to_numpy(zero_copy_only=False)
    return np.asarray(x, dtype=dtype)


def type_code(types) -> np.ndarray:
    """Map type strings ("node"|"way"|"relation") to codes 0|1|2, vectorized.

    Arrow inputs stay in C++ (``index_in`` against the 3-value set) — converting a
    10^5-row string column to a numpy object array costs one Python object per row
    and sat inside the stream's per-batch augment path."""
    if isinstance(types, (pa.Array, pa.ChunkedArray)):
        import pyarrow.compute as pc

        idx = pc.index_in(types, value_set=pa.array(["node", "way", "relation"]))
        return idx.cast(pa.int64()).to_numpy(zero_copy_only=False)
    arr = np.asarray(types)
    out = np.zeros(arr.shape, dtype=np.int64)
    out[arr == "way"] = WAY
    out[arr == "relation"] = RELATION
    return out


def pack(ids, codes) -> np.ndarray:
    """(id, type_code) → packed int64 key: ``(id << 2) | code``."""
    return (_as_np(ids) << 2) | _as_np(codes)


def pack_typed(ids, types) -> np.ndarray:
    """(id, type string) → packed key."""
    return pack(ids, type_code(types))


def unpack_id(keys) -> np.ndarray:
    """packed key → id (``key >> 2``)."""
    return _as_np(keys) >> 2


def unpack_code(keys) -> np.ndarray:
    """packed key → type code (``key & 0x3``)."""
    return _as_np(keys) & 0x3


def partition_number(ids, codes) -> np.ndarray:
    """Reference partition fn: divide id by 10 while > 2048, then XOR the type code.

    Repeated integer division by 10 equals a single division by 10**k (floor composition),
    so this vectorizes as a bounded where-loop (int64 needs ≤ 19 rounds).
    """
    p = _as_np(ids).copy()
    codes = _as_np(codes)
    for _ in range(19):
        over = p > PARTITION_LIMIT
        if not over.any():
            break
        p = np.where(over, p // 10, p)
    return p ^ codes


def partition_number_typed(ids, types) -> np.ndarray:
    return partition_number(ids, type_code(types))


def latest_ts_mask(group: np.ndarray, ts: np.ndarray, cand: np.ndarray) -> np.ndarray:
    """Keep-mask: rows OUTSIDE ``cand`` all survive; within ``cand``, only each
    ``group``-key's max-``ts`` rows survive (ALL ties kept, so stable downstream
    sorts resolve them exactly as the unmasked input would).

    Shared kernel of the render-domain node-history prune (stages.augment
    ``node_history_prune``) and the storage-tier latest-version mask
    (sources.snapshot ``prune_node_latest``)."""
    keep = np.ones(len(group), bool)
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return keep
    k, t = group[idx], ts[idx]
    o = np.lexsort((-t, k))
    ks, tsr = k[o], t[o]
    head = np.r_[True, ks[1:] != ks[:-1]]
    # per-row max ts of its key group = ts at the group head (sorted -ts within key)
    gmax = tsr[np.maximum.accumulate(np.where(head, np.arange(len(ks)), 0))]
    keep[idx[o]] = tsr == gmax
    return keep


def mix_key_ts(keys: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """64-bit hash-combine of (packed key, epoch-ms ts) pairs — the tier-side
    node-history prunes use it to detect "suspect" rows whose (key, ts) matches a
    current-update row (a re-delivered identical row turns in_update=True after the
    dedup OR, so its OLDER sibling is the true before-window version and must not be
    pruned). A collision only marks an extra suspect, i.e. prunes less — safe."""
    a = keys.astype(np.uint64, copy=False) * np.uint64(0x9E3779B97F4A7C15)
    b = ts.astype(np.uint64, copy=False) * np.uint64(0xC2B2AE3D27D4EB4F)
    return a ^ (b + np.uint64(0x9E3779B9) + (a << np.uint64(6)) + (a >> np.uint64(2)))


def isin_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in a SORTED array — searchsorted beats np.isin."""
    if len(sorted_set) == 0:
        return np.zeros(len(values), bool)
    pos = np.minimum(np.searchsorted(sorted_set, values), len(sorted_set) - 1)
    return sorted_set[pos] == values
