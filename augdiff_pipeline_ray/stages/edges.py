"""Dependency-edge extraction (J1 distributed / J3 local) — vectorized Arrow kernels.

Reference semantics (common/src/main/scala/ComputeIndex.scala:48-71 and
ComputeIndexLocal.scala:20-47): an edge ``(a, b)`` means "entity ``b`` directly depends on
entity ``a``":

* ways: every ``nds.ref`` → ``(pack(ref, node), pack(way_id, way))``
* relations: every ``members.(type, ref)`` → ``(pack(ref, member_type), pack(rel_id, relation))``
* local variant additionally emits a node **self-edge** ``(key, key)`` so isolated nodes are
  represented in the per-batch closure graph (ComputeIndexLocal.scala:27-28).

Implemented with ``pyarrow.compute`` list flatten + parent-index gather — no Python row
loop — and used identically from the distributed index job (``flat``-style ``map_batches``)
and the per-micro-batch local closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import keys as K


def _list_explode(batch: pa.Table, list_col: str):
    """→ (parent_row_indices, flattened_values) for a list column, combined across chunks."""
    col = batch[list_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    return parents.to_numpy(zero_copy_only=False), flat


def edges_from_batch(batch: pa.Table, node_self_edges: bool = False) -> pa.Table:
    """Element batch (ELEMENT/CHANGE schema) → edge table (a, b, cell).

    ``cell`` is the *dependent's* cell (b-side) — the engine's partition key for the index.
    """
    types = batch["type"].to_numpy(zero_copy_only=False)
    ids = batch["id"].to_numpy(zero_copy_only=False)
    cells_np = (
        batch["cell"].to_numpy(zero_copy_only=False)
        if "cell" in batch.column_names
        else np.zeros(len(batch), np.int64)
    )

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_cell: list[np.ndarray] = []

    way_mask = types == "way"
    if way_mask.any():
        ways = batch.filter(pa.array(way_mask))
        parents, flat = _list_explode(ways, "nds")
        refs = flat.field("ref").to_numpy(zero_copy_only=False)
        way_ids = ways["id"].to_numpy(zero_copy_only=False)[parents]
        way_cells = (
            ways["cell"].to_numpy(zero_copy_only=False)[parents]
            if "cell" in batch.column_names
            else np.zeros(len(parents), np.int64)
        )
        out_a.append(K.pack(refs, np.full(len(refs), K.NODE)))
        out_b.append(K.pack(way_ids, np.full(len(way_ids), K.WAY)))
        out_cell.append(way_cells)

    rel_mask = types == "relation"
    if rel_mask.any():
        rels = batch.filter(pa.array(rel_mask))
        parents, flat = _list_explode(rels, "members")
        refs = flat.field("ref").to_numpy(zero_copy_only=False)
        mtypes = flat.field("type").to_numpy(zero_copy_only=False)
        rel_ids = rels["id"].to_numpy(zero_copy_only=False)[parents]
        rel_cells = (
            rels["cell"].to_numpy(zero_copy_only=False)[parents]
            if "cell" in batch.column_names
            else np.zeros(len(parents), np.int64)
        )
        out_a.append(K.pack(refs, K.type_code(mtypes)))
        out_b.append(K.pack(rel_ids, np.full(len(rel_ids), K.RELATION)))
        out_cell.append(rel_cells)

    if node_self_edges:
        node_mask = types == "node"
        if node_mask.any():
            node_keys = K.pack(ids[node_mask], np.zeros(node_mask.sum(), np.int64))
            out_a.append(node_keys)
            out_b.append(node_keys)
            out_cell.append(cells_np[node_mask])

    if not out_a:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "cell": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
            "cell": pa.array(np.concatenate(out_cell)),
        }
    )


def edges_from_rows_local(batch: pa.Table) -> set[tuple[int, int]]:
    """Local-variant edge set incl. node self-edges, as python int pairs
    (the per-micro-batch closure input — ComputeIndexLocal.scala:20-47)."""
    a, b = edges_from_rows_np(batch)
    return set(zip(a.tolist(), b.tolist()))


def edges_from_rows_np(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Array view of :func:`edges_from_rows_local` (may contain duplicate pairs —
    the closure kernels dedup internally; the hot stream path stays numpy)."""
    t = edges_from_batch(batch, node_self_edges=True)
    return (
        t["a"].to_numpy(zero_copy_only=False),
        t["b"].to_numpy(zero_copy_only=False),
    )
