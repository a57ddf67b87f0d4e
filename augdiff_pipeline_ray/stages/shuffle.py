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
    return set(pdf.loc[pdf["n"] >= hot_threshold, key].astype(np.int64).tolist())


def add_salt(
    ds: rd.Dataset, key: str, hot_keys: set[int], k: int = 8
) -> rd.Dataset:
    """Stamp a ``salt`` column: hash-spread 0..k-1 for hot keys, 0 for cold keys."""
    hot_ref = ray.put(np.fromiter(hot_keys, np.int64, len(hot_keys)))

    def stamp(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        kv = t[key].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(t), np.int64)
        mask = np.isin(kv, hot)
        if mask.any():
            # deterministic row hash: mix the row's position-invariant content
            idx = np.arange(len(t))[mask]
            salt[mask] = (kv[mask] * 0x9E3779B1 + idx) % k
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
        df = pd.DataFrame(
            {key: t[key].to_numpy(zero_copy_only=False),
             "salt": t["salt"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby([key, "salt"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

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
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge: Callable[[pd.DataFrame], pd.DataFrame],
    hot_threshold: int = 100_000,
    k: int = 8,
) -> rd.Dataset:
    """General salted map_groups: ``fn`` runs per (key, salt) sub-group, ``merge``
    combines a key's sub-results (must be associative w.r.t. fn's output)."""
    hot = detect_hot_keys(ds, key, hot_threshold)
    salted = add_salt(ds, key, hot, k)
    per_salt = salted.groupby([key, "salt"]).map_groups(fn, batch_format="pandas")
    return per_salt.groupby(key).map_groups(merge, batch_format="pandas")


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
