"""Skew-aware shuffles: hot-key detection, salted groupby, two-phase merge.

The reference's partition fn deliberately concentrates hot id ranges (SURVEY.md §4.3);
the graft's analogue is dense metro cells (worldgen puts ~30% of tiles into 2 hot cells
on purpose). A plain ``groupby(cell)`` then hands one reducer most of the data. The
explicit treatment here (north rule: "hot cells get explicit skew splitting"):

1. **detect** — a cheap pre-pass of per-batch partial counts (one row per key per batch)
   finds keys above ``hot_threshold``.
2. **salt** — rows of hot keys get ``salt = row_hash % k`` (cold keys salt 0), and the
   shuffle key becomes ``(key, salt)``: a hot key's group splits into ``k`` reducers.
3. **merge** — per-(key, salt) partial results are combined by a second, tiny
   ``groupby(key)`` over one row per sub-group — exact, nothing double-counted.

``salted_group_count`` is the counting instance; ``salted_group_apply`` takes any
per-group fn + an associative merge fn for the general case. Both verified equal to the
unsalted result on the deliberately-skewed image table (tests).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions.text import fingerprint64_arrow


def detect_hot_keys(ds: rd.Dataset, key: str, hot_threshold: int) -> set[int]:
    """Partial per-batch counts → small groupby → keys with count ≥ hot_threshold.

    Only (key, partial_count) rows shuffle — the detection pass never moves data rows.
    """
    def partial(t: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            t[key].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({key: pa.array(keys), "n": pa.array(counts)})

    agg = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    pdf = agg.to_pandas()
    hot = pdf.loc[pdf["n"] >= hot_threshold, key]
    if pd.api.types.is_integer_dtype(hot):
        hot = hot.astype(np.int64)
    return set(hot.tolist())


def add_salt(
    ds: rd.Dataset, key: str, hot_keys: set, k: int = 8
) -> rd.Dataset:
    """Stamp a ``salt`` column: hash-spread 0..k-1 for hot keys, 0 for cold keys.
    Integer keys mix directly; string keys (e.g. an event-type column whose every
    value is hot) mix through the vectorized FNV-1a fingerprint."""
    int_keys = all(isinstance(h, (int, np.integer)) for h in hot_keys)
    hot_ref = ray.put(
        np.fromiter(hot_keys, np.int64, len(hot_keys)) if int_keys
        else np.asarray(sorted(hot_keys), object)
    )

    def stamp(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        kv = t[key].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(t), np.int64)
        mask = np.isin(kv, hot)
        if mask.any():
            if kv.dtype.kind in "iu":
                base = kv[mask].astype(np.int64)
            else:
                base = fingerprint64_arrow(pa.array(kv[mask].astype(str)))
            # deterministic row hash: mix the row's position-invariant content
            idx = np.arange(len(t))[mask]
            salt[mask] = (base * 0x9E3779B1 + idx) % k
        if "salt" in t.column_names:
            t = t.drop_columns(["salt"])
        return t.append_column("salt", pa.array(salt))

    return ds.map_batches(stamp, batch_format="pyarrow")


def salted_group_count(
    ds: rd.Dataset, key: str, hot_threshold: int = 100_000, k: int = 8
) -> rd.Dataset:
    """Exact per-key counts with hot keys split across k reducers then re-merged."""
    hot = detect_hot_keys(ds, key, hot_threshold)
    salted = add_salt(ds, key, hot, k)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([key, "salt"])
            .group_by([key, "salt"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key, "salt", "n"])

    per_salt = (
        salted.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "salt"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # merge phase: one row per (key, salt) — tiny
    return per_salt.groupby(key).aggregate(Sum("n", alias_name="n"))


def salted_group_apply(
    ds: rd.Dataset,
    key: str,
    fn: Callable[[pa.Table], pa.Table],
    merge: Callable[[pa.Table], pa.Table],
    hot_threshold: int = 100_000,
    k: int = 8,
) -> rd.Dataset:
    """General salted map_groups: ``fn`` runs per (key, salt) sub-group, ``merge``
    combines a key's sub-results (must be associative w.r.t. fn's output). Arrow
    end-to-end — both callables take and return ``pa.Table``. Production user:
    ``hot_type_value_topk`` (pipelines/tpch_queries.py), where every event-type
    key holds ~1/5 of the table and would otherwise serialize on one reducer."""
    hot = detect_hot_keys(ds, key, hot_threshold)
    salted = add_salt(ds, key, hot, k)
    per_salt = salted.groupby([key, "salt"]).map_groups(fn, batch_format="pyarrow")
    return per_salt.groupby(key).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# global zip-with-index over a sorted Dataset (rank assignment without collect)
# ---------------------------------------------------------------------------


def zip_with_index(ds: rd.Dataset, index_col: str = "rank") -> rd.Dataset:
    """Stamp each row with its global 0-based position in the Dataset's block order.

    Ray Data has no zipWithIndex; this is the classic two-pass block-offset scheme,
    one of the few places raw Ray tasks are warranted (SURVEY.md §2 RD-mapping rule):
    the sorted Dataset's blocks stay in the object store as Arrow tables
    (``to_arrow_refs`` moves REFERENCES, not data), a metadata-only pass reads each
    block's row count, the driver prefix-sums the tiny count vector, and a remote
    task per block stamps ``offset + arange(n)`` — no row ever touches the driver.
    After ``ds.sort(keys)``, block order IS the sort order, so the stamped column is
    the exact global rank (ties resolved by the caller's sort key)."""
    refs = ds.to_arrow_refs()

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _stamp(t: pa.Table, offset: int) -> pa.Table:
        return t.append_column(
            index_col, pa.array(offset + np.arange(t.num_rows, dtype=np.int64))
        )

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    stamped = [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(stamped)


# ---------------------------------------------------------------------------
# sorted-block within-group pair generation (no per-group Python dispatch)
# ---------------------------------------------------------------------------


def _pairs_kernel(key: np.ndarray, val: np.ndarray, both: bool):
    """Vectorized within-group unordered pair generation over (key, val) rows
    that are SORTED by (key, val): dedup consecutive equal rows, then an
    offset-j sweep emits (val[i], val[i+j]) wherever key[i] == key[i+j] —
    J iterations of pure numpy, J = the largest group size present."""
    if len(key) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keep = np.concatenate([[True], (key[1:] != key[:-1]) | (val[1:] != val[:-1])])
    key, val = key[keep], val[keep]
    xs, ys = [], []
    j = 1
    while True:
        if j >= len(key):
            break
        m = key[:-j] == key[j:]
        if not m.any():
            break
        xs.append(val[:-j][m])
        ys.append(val[j:][m])
        j += 1
    if not xs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    if both:
        return np.concatenate([x, y]), np.concatenate([y, x])
    return x, y


def grouped_pairs_sorted(
    items: rd.Dataset, key: str, val: str, both_orientations: bool = False
) -> rd.Dataset:
    """Within-group (basket) pair stream WITHOUT per-group Python dispatch and
    WITHOUT an extra all-to-all: ONE sort on the group key (the same exchange
    class a hash groupby costs), then each sorted block runs the vectorized
    offset-sweep kernel over its interior groups; a block's FIRST and LAST
    groups may straddle block boundaries, so their rows route to a tiny
    residual (≤ 2 groups × blocks — group-size bound, not data bound) that
    runs the identical kernel once in a REMOTE task, so a hot group (skewed
    basket) lands in one worker's heap, never the driver's. The residual is
    still single-task — callers with a pathological single group holding a
    material fraction of all rows should pre-split that key (salt) before
    calling; for the basket families here group size is order-size bounded.
    Output columns (x, y), per-group-distinct.

    Replaces ``groupby(key).map_groups(pairs)`` for the basket-pair family —
    measured 12-14 s → seconds at sf0.1 where ~150k per-group Python calls
    dominated; the join-based alternative was strictly slower (an extra
    all-to-all + s²-per-key join output, see VERDICT_RESPONSE)."""
    s = items.sort([key, val])
    refs = s.to_arrow_refs()

    kv_empty = pa.table(
        {key: pa.array([], pa.int64()), val: pa.array([], pa.int64())}
    )

    @ray.remote(num_returns=2)
    def split(t: pa.Table):
        if t.num_rows == 0:
            # fixed-schema empties: a sorted empty block can arrive with ZERO
            # columns and a mixed-schema residual concat raises ArrowInvalid
            empty = pa.table({"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())})
            return empty, kv_empty
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        first, last = k[0], k[-1]
        edge = (k == first) | (k == last)
        inner = ~edge
        v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _pairs_kernel(k[inner], v[inner], both_orientations)
        return (
            pa.table({"x": pa.array(x), "y": pa.array(y)}),
            t.select([key, val]).filter(pa.array(edge)),
        )

    empty_pairs = pa.table(
        {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
    )
    if not refs:  # empty input dataset → empty (x, y) dataset
        return rd.from_arrow([empty_pairs])

    @ray.remote
    def residual_pairs(*edges: pa.Table) -> pa.Table:
        residual = pa.concat_tables(edges)
        if residual.num_rows == 0:
            return empty_pairs
        k = residual[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = residual[val].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((v, k))
        rx, ry = _pairs_kernel(k[o], v[o], both_orientations)
        return pa.table({"x": pa.array(rx), "y": pa.array(ry)})

    out = [split.remote(r) for r in refs]
    pair_refs = [pr for pr, _ in out]
    res_ref = residual_pairs.remote(*[er for _, er in out])
    return rd.from_arrow_refs(pair_refs + [res_ref])
