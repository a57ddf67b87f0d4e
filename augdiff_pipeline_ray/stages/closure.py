"""Transitive dependency closure — distributed (J2) and per-batch local (J4).

Reference: GraphX Pregel ``pushBackwards`` (common/src/main/scala/ComputeIndex.scala:19-94)
computes, for every entity ``a``, the set of entities transitively depending on it, emitted
as ``(a, b)`` pairs with ``a != b``. The rebuild is Ray-Data-native **semi-naïve
expansion** instead of BSP vertex programs: each round hash-joins the current frontier
against the direct-edge relation (``frontier.b == edges.a``) to extend paths by one hop;
OSM dependency depth is tiny (node→way→relation→relation…, ~3-5 rounds), so the loop
terminates after a handful of all-to-all joins. Each join is ``Dataset.join`` (hash
partitioned on the key); per-round dedup keeps frontier blow-up bounded.

The graph is a DAG on real OSM data (relations referencing ancestor relations would cycle;
the reference's Pregel converges there, our loop caps at ``max_rounds`` and the per-batch
local fixpoint handles cycles exactly — SURVEY.md §4.4.3).

The local variant (ComputeIndexLocal.scala:49-89) runs the same fixpoint in-process over
int pair sets for one micro-batch: direct row edges ∪ the 2-hop edge fetch from the index
store, expanded to stability, then ``new = all − existing``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _distinct_pairs(ds: rd.Dataset) -> rd.Dataset:
    """Exact dedup of (a, b) pairs: hash-partition groupby + per-group head(1) semantics
    via map_groups drop_duplicates (scales: only the pair columns move).

    Known Ray 2.49 hazard (see stages/components.py): a groupby whose FIRST output
    partition is empty emits a zero-column block, and a downstream ``Dataset.join``
    crashes on it. Here the join inputs carry thousands+ of pairs over ≤64 partitions
    (P(partition 0 empty) ≈ (1-1/n)^rows ≈ 0) and tiny graphs take ``closure_auto``'s
    local plan, so no repartition pass is spent on it; genuinely small join inputs
    must ``.repartition()`` first (components.py does)."""
    return ds.groupby(["a", "b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


def _anti_join_pairs(left: rd.Dataset, right: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """left − right on (a, b): left_outer join against a marked right, keep null marks."""
    marked = right.map_batches(
        lambda t: t.append_column("__hit", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )
    joined = left.join(
        marked,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("a", "b"),
    )
    return joined.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["__hit"])).select(["a", "b"]),
        batch_format="pyarrow",
    )


def default_join_partitions() -> int:
    """Join fan-in sized to the cluster: hash-shuffle aggregator actors each hold a
    partition, so more partitions than CPUs just queues actors (and can starve a small
    local session)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cpus, 64))


def closure_dataset(
    edges: rd.Dataset,
    max_rounds: int = 12,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Direct-edge Dataset (a, b[, cell]) → transitive-closure Dataset (a, b), a != b.

    Reachability **doubling**: P₀ = E; each round P ← P ∪ distinct(P ∘ P) − P, so path
    length covered doubles per round (diameter d needs ⌈log₂ d⌉ all-to-all joins — OSM
    depth ~4 converges in 2). Each round is a ``Dataset.join`` hash-partitioned on the
    composite key plus an anti-join dedup, keeping per-round work proportional to the
    *new* pairs only.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    paths = edges.select_columns(["a", "b"]).map_batches(
        lambda t: t.filter(pa.compute.not_equal(t["a"], t["b"])),
        batch_format="pyarrow",
    )
    paths = _distinct_pairs(paths).materialize()

    for _ in range(max_rounds):
        f = paths.rename_columns({"b": "mid"})
        e = paths.rename_columns({"a": "mid"})
        ext = f.join(
            e,
            join_type="inner",
            num_partitions=num_partitions,
            on=("mid",),
        ).select_columns(["a", "b"])
        ext = ext.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["a"], t["b"])),
            batch_format="pyarrow",
        )
        ext = _distinct_pairs(ext)
        new = _anti_join_pairs(ext, paths, num_partitions).materialize()
        if new.count() == 0:
            break
        paths = _distinct_pairs(paths.union(new)).materialize()
    return paths


def closure_numpy(a: np.ndarray, b: np.ndarray, max_rounds: int = 40) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized in-memory transitive closure over int64 pair arrays.

    Semi-naïve expansion on **rank-packed** pairs: vertices remap to dense int32 ranks
    (``np.unique`` keeps rank order == value order, so packed-key order == (a, b)
    order), each (a, b) packs into one int64, and every round is 1-D numpy — a
    searchsorted merge-join of the frontier against the direct relation, a 1-D
    ``np.unique``, a sorted-membership anti-join, and a linear two-way merge. Only
    the pairs NEW last round expand, so total work ≈ closure size × diameter (OSM
    dependency depth ~3-5). ~8× the 2-D ``np.unique(axis=0)`` doubling this replaces.
    Used by the size-adaptive plan below for edge sets that fit one node comfortably
    (the ≤5M-edge branch of :func:`closure_auto`, where the <2³² distinct-vertex
    bound of the rank pack always holds).
    """
    verts, closure = _closure_packed(a, b, max_rounds)
    if len(closure) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return verts[closure >> 32], verts[closure & 0xFFFFFFFF]


def _closure_packed(
    a: np.ndarray, b: np.ndarray, max_rounds: int = 40
) -> tuple[np.ndarray, np.ndarray]:
    """Core of :func:`closure_numpy`: → (sorted vertex table, sorted rank-packed
    closure pairs). Rank order == value order, so the packed keys sort exactly like
    (a, b) value pairs — callers can diff/merge edge sets in packed space."""
    m = a != b
    a, b = a[m], b[m]
    if len(a) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    verts = np.unique(np.concatenate([a, b]))
    ra = np.searchsorted(verts, a).astype(np.int64)
    rb = np.searchsorted(verts, b).astype(np.int64)
    keys = np.unique((ra << 32) | rb)
    ea = keys >> 32            # direct relation, sorted by source rank
    eb = keys & 0xFFFFFFFF
    closure = keys
    fkeys = keys               # frontier: pairs discovered last round
    for _ in range(max_rounds):
        fb = fkeys & 0xFFFFFFFF
        lo = np.searchsorted(ea, fb, side="left")
        hi = np.searchsorted(ea, fb, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            break
        grp_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total) - np.repeat(grp_start, counts)
        offs = np.repeat(lo, counts) + within
        ext = np.unique((np.repeat(fkeys >> 32, counts) << 32) | eb[offs])
        ext = ext[(ext >> 32) != (ext & 0xFFFFFFFF)]
        pos = np.minimum(np.searchsorted(closure, ext), len(closure) - 1)
        fkeys = ext[closure[pos] != ext]
        if len(fkeys) == 0:
            break
        merged = np.empty(len(closure) + len(fkeys), np.int64)
        idx = np.searchsorted(closure, fkeys) + np.arange(len(fkeys))
        mask = np.ones(len(merged), bool)
        mask[idx] = False
        merged[idx] = fkeys
        merged[mask] = closure
        closure = merged
    return verts, closure


def closure_auto(
    edges: rd.Dataset,
    small_threshold: int = 5_000_000,
    num_partitions: int | None = None,
) -> pa.Table | rd.Dataset:
    """Size-adaptive closure plan: count the direct edges first (cheap — two int64
    columns); below ``small_threshold`` pairs, collect and run the vectorized numpy
    doubling (Ray shuffle rounds cost seconds of fixed overhead that dwarf small
    inputs) and return an Arrow table; above it, run the distributed join rounds and
    return the (materialized-in-object-store) **Dataset** — the closure is the biggest
    table in the system and must stream to its sink, never through the driver."""
    slim = edges.select_columns(["a", "b"]).materialize()
    n = slim.count()
    if n <= small_threshold:
        pdf = slim.to_pandas()
        a, b = closure_numpy(
            pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)
        )
        return pa.table({"a": pa.array(a), "b": pa.array(b)})
    return closure_dataset(slim, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# local (per-micro-batch) incremental closure — ComputeIndexLocal semantics
# ---------------------------------------------------------------------------


def local_closure(
    row_edges: set[tuple[int, int]],
    existing_edges: set[tuple[int, int]],
) -> tuple[set[tuple[int, int]], set[tuple[int, int]]]:
    """(new_edges, all_edges) for one micro-batch.

    Exact transcription of the reference's in-memory fixpoint
    (ComputeIndexLocal.scala:49-89): graph maps a → set of direct dependents; repeatedly
    fold dependents-of-dependents in until stable; drop self-pairs; diff against existing.
    Handles cycles (sets converge).
    """
    graph: dict[int, set[int]] = {}
    for a, b in row_edges | existing_edges:
        graph.setdefault(a, set()).add(b)

    keep_going = True
    while keep_going:
        keep_going = False
        for deps1 in graph.values():
            for b in list(deps1):
                deps2 = graph.get(b)
                if deps2 is not None and not deps2 <= deps1:
                    deps1 |= deps2
                    keep_going = True

    all_edges = {(a, b) for a, deps in graph.items() for b in deps if a != b}
    new_edges = all_edges - existing_edges
    return new_edges, all_edges


def local_closure_np(
    row_a: np.ndarray, row_b: np.ndarray,
    ex_a: np.ndarray, ex_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(new_a, new_b, all_a, all_b) — vectorized :func:`local_closure`.

    Same semantics (transitive closure of row ∪ existing, self-pairs dropped, new =
    all − existing; equivalence pytest-asserted), but pure int64 numpy end-to-end:
    the per-micro-batch Python dict-of-sets fixpoint was the stream's largest
    driver-serial term at real churn (24k nodes → ~10⁵ edges per batch). Outputs are
    (a, b)-sorted and deduped (rank-packed closure keys are value-ordered)."""
    a = np.concatenate([row_a, ex_a]).astype(np.int64, copy=False)
    b = np.concatenate([row_b, ex_b]).astype(np.int64, copy=False)
    verts, keys = _closure_packed(a, b)
    if len(keys) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e
    all_a = verts[keys >> 32]
    all_b = verts[keys & 0xFFFFFFFF]
    if len(ex_a):
        ra = np.searchsorted(verts, ex_a)
        rb = np.searchsorted(verts, ex_b)
        ex_keys = np.unique((ra.astype(np.int64) << 32) | rb.astype(np.int64))
        pos = np.minimum(np.searchsorted(ex_keys, keys), len(ex_keys) - 1)
        is_new = ex_keys[pos] != keys
    else:
        is_new = np.ones(len(keys), bool)
    return all_a[is_new], all_b[is_new], all_a, all_b


def local_closure_for_batch(
    batch: pa.Table,
    existing_edges: set[tuple[int, int]],
) -> tuple[set[tuple[int, int]], set[tuple[int, int]]]:
    """Convenience: change-batch Arrow table → (new_edges, all_edges)."""
    from .edges import edges_from_rows_local

    return local_closure(edges_from_rows_local(batch), existing_edges)


def brute_force_closure(edges: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """O(V·E) reachability oracle for tests: all (a, b) with a path a→…→b, a != b."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out: set[tuple[int, int]] = set()
    for start in adj:
        seen: set[int] = set()
        stack = list(adj[start])
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj.get(v, ()))
        out |= {(start, v) for v in seen if v != start}
    return out
